package graft.auth

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.concurrent.ExecutionContext

import graft.model.Token
import graft.util.Json

/** Driver-side background token refresher: keeps the TokenManager's cached
  * token warm for the job lifetime so the RPC service always has a fresh
  * token to serve. Ref: src/auth/token/token_manager.py:78-137 (1 s loop);
  * hosted on a dedicated thread like AsyncBackgroundService
  * (src/core/coroutine.py:21-171) — here a ScheduledExecutorService.
  */
final class DriverTokenManager(manager: TokenManager)(implicit ec: ExecutionContext) {
  private var exec: Option[ScheduledExecutorService] = None

  def start(): Unit = synchronized {
    if (exec.isEmpty) {
      val s = Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-driver-token-refresh"); t.setDaemon(true); t
      }
      s.scheduleWithFixedDelay(() => {
        try scala.concurrent.Await.ready(manager.getToken(), scala.concurrent.duration.Duration(30, "s"))
        catch { case _: Exception => () }
      }, 0L, 1L, TimeUnit.SECONDS)
      exec = Some(s)
    }
  }

  def stop(): Unit = synchronized { exec.foreach(_.shutdownNow()); exec = None }

  /** Block until the first token is available (readiness). */
  def awaitReady(timeoutSeconds: Int = 30): Unit = {
    val deadline = System.nanoTime() + timeoutSeconds * 1000000000L
    while (manager.currentToken.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    if (manager.currentToken.isEmpty)
      throw new RuntimeException(s"Driver token manager not ready after ${timeoutSeconds}s")
  }
}

/** Driver-hosted token RPC: GET /token → {"token_value": ..., "expires_at": ...}.
  * Workers poll this instead of hitting the identity provider N-executors
  * times. Ref: src/auth/rpc/service.py:13-229. The reference walks a
  * restricted-port list; binding port 0 (kernel-assigned ephemeral) achieves
  * the same "free safe port" guarantee in one step.
  */
final class TokenRpcServer(manager: TokenManager, host: String) {
  private var server: Option[HttpServer] = None
  @volatile var boundUrl: String = _

  def start(): Unit = synchronized {
    if (server.isEmpty) {
      val s = HttpServer.create(new InetSocketAddress(host, 0), 0)
      s.createContext("/token", new HttpHandler {
        def handle(x: HttpExchange): Unit = {
          val (code, body) = manager.currentToken match {
            case Some(Token(v, exp)) =>
              (200, Json.write(Map("token_value" -> v, "expires_at" -> exp.map(_.toString).orNull)))
            case None => (503, Json.write(Map("error" -> "token not ready")))
          }
          val bytes = body.getBytes(StandardCharsets.UTF_8)
          x.getResponseHeaders.set("Content-Type", "application/json")
          x.sendResponseHeaders(code, bytes.length)
          val os = x.getResponseBody; os.write(bytes); os.close()
        }
      })
      s.setExecutor(Executors.newFixedThreadPool(2, r => {
        val t = new Thread(r, "graft-token-rpc"); t.setDaemon(true); t
      }))
      s.start()
      boundUrl = s"http://$host:${s.getAddress.getPort}"
      server = Some(s)
    }
  }

  def stop(): Unit = synchronized { server.foreach(_.stop(0)); server = None }
}

/** Wires DriverTokenManager + TokenRpcServer lifecycle (start both, await
  * readiness, expose rpc_url; stop tears both down).
  * Ref: src/auth/rpc/bootstrap.py:9-102.
  */
final class RpcBootstrapper(provider: TokenProvider, refreshMargin: Long, driverHost: String)(
    implicit ec: ExecutionContext) {
  private val manager = new TokenManager(provider, refreshMargin)
  private val refresher = new DriverTokenManager(manager)
  private val server = new TokenRpcServer(manager, driverHost)

  /** Returns the rpc_url workers should poll. If readiness or server bind
    * fails, the refresh loop is stopped before rethrowing — otherwise the
    * caller never receives the stop handle and the 1s-interval refresher
    * would poll the identity provider for the rest of the JVM's life. */
  def start(): String = {
    refresher.start()
    try {
      refresher.awaitReady()
      server.start()
    } catch {
      case e: Throwable =>
        refresher.stop()
        throw e
    }
    server.boundUrl
  }

  def stop(): Unit = { server.stop(); refresher.stop() }
}
