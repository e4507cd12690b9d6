package graft.auth

import scala.concurrent.ExecutionContext

import graft.config._
import graft.middleware.{Injectors, Middleware}

/** Auth strategy: config → worker-side middleware + optional driver runtime.
  * Ref: src/auth/strategy.py:26-272.
  *
  * Serialization discipline (ref comment strategy.py:179): nothing here
  * closes over live objects — workers receive only the AuthConfig case class
  * plus the rpc_url string and build providers/managers locally.
  */
object AuthStrategy {

  /** Driver-side: for OAuth2 strategies, start the token refresh loop + RPC
    * server and return (rpc_url, stop). For none/basic/bearer: no runtime.
    * Ref: strategy.py:105-143 (runtime_start/stop), orchestrator.py:176-190.
    */
  def startRuntime(auth: AuthConfig, driverHost: String)(
      implicit ec: ExecutionContext): (Option[String], () => Unit) =
    auth match {
      case o: OAuth2PasswordAuth =>
        val boot = new RpcBootstrapper(
          new PasswordGrantTokenProvider(o.tokenUrl, o.clientId, o.clientSecret, o.username, o.password),
          o.refreshMarginSeconds, driverHost)
        (Some(boot.start()), () => boot.stop())
      case o: OAuth2ClientCredentialsAuth =>
        val boot = new RpcBootstrapper(
          new ClientGrantTokenProvider(o.tokenUrl, o.clientId, o.clientSecret),
          o.refreshMarginSeconds, driverHost)
        (Some(boot.start()), () => boot.stop())
      case _ => (None, () => ())
    }

  /** Worker-side: build the auth middleware chain segment. OAuth2 uses
    * RPC-primary + direct-grant-fallback behind a per-chain TokenManager
    * (ref: strategy.py:145-272). Appended AFTER user middleware, like the
    * reference (orchestrator.py:186-190).
    */
  def middlewares(auth: AuthConfig, rpcUrl: Option[String])(
      implicit ec: ExecutionContext): Seq[Middleware.Middleware] =
    auth match {
      case NoAuth => Seq.empty
      case BasicAuth(u, p) => Seq(Injectors.headerAuth(u, p))
      case BearerAuth(token) =>
        Seq(Injectors.bearerToken(new TokenManager(new StaticTokenProvider(token))))
      case o: OAuth2PasswordAuth =>
        val primary = rpcUrl.map(new RpcTokenProvider(_))
        val fallback = new PasswordGrantTokenProvider(
          o.tokenUrl, o.clientId, o.clientSecret, o.username, o.password)
        Seq(Injectors.bearerToken(new TokenManager(
          new FallbackTokenProvider(primary, fallback), o.refreshMarginSeconds)))
      case o: OAuth2ClientCredentialsAuth =>
        val primary = rpcUrl.map(new RpcTokenProvider(_))
        val fallback = new ClientGrantTokenProvider(o.tokenUrl, o.clientId, o.clientSecret)
        Seq(Injectors.bearerToken(new TokenManager(
          new FallbackTokenProvider(primary, fallback), o.refreshMarginSeconds)))
    }
}
