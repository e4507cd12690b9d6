package graft.middleware

import java.net.InetAddress
import java.time.Instant
import java.util.Base64
import scala.concurrent.{ExecutionContext, Future}

import graft.model.RequestExchange
import graft.transport.TransportEngine
import Middleware._

/** Async source of bearer tokens (implemented by graft.auth.TokenManager). */
trait TokenSource {
  def tokenValue()(implicit ec: ExecutionContext): Future[String]
  def telemetry: Map[String, Any]
}

/** Injectors — middleware that always calls next exactly once.
  * Ref: src/request_execution/middleware/injectors.py.
  */
object Injectors {

  /** Authorization: Bearer <token> from an async token source, with provider
    * telemetry in metadata.token_provider. Ref: injectors.py:23-46.
    */
  def bearerToken(tokens: TokenSource)(implicit ec: ExecutionContext): Middleware = { (ex, next) =>
    tokens.tokenValue().flatMap { tv =>
      val ctx = ex.context.copy(headers = ex.context.headers + ("Authorization" -> s"Bearer $tv"))
      next(ex.copy(context = ctx).withMeta("token_provider", tokens.telemetry))
    }
  }

  /** Authorization: Basic base64(user:pass). Ref: injectors.py:49-67. */
  def headerAuth(username: String, password: String): Middleware = { (ex, next) =>
    val b64 = Base64.getEncoder.encodeToString(
      s"$username:$password".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    next(ex.copy(context = ex.context.copy(
      headers = ex.context.headers + ("Authorization" -> s"Basic $b64"))))
  }

  /** Copy row columns into query params per param_mapping
    * (endpoint_param -> source_column). Ref: injectors.py:70-87.
    */
  val paramInjector: Middleware = { (ex, next) =>
    val injected = ex.context.paramMapping.flatMap { case (param, col) =>
      ex.row.get(col).map(param -> _)
    }
    next(ex.copy(context = ex.context.copy(params = ex.context.params ++ injected)))
  }

  /** "-> METHOD url" before, "<- status url" (or FAILED) after.
    * Ref: injectors.py:90-112.
    */
  def logging(implicit ec: ExecutionContext): Middleware = { (ex, next) =>
    next(ex.withLog(s"-> ${ex.context.method} ${ex.context.url}")).map { res =>
      res.statusCode match {
        case Some(s) => res.withLog(s"<- $s ${res.context.url}")
        case None    => res.withLog(s"<- FAILED ${res.context.url}: ${res.errorMessage.orNull}")
      }
    }
  }

  /** metadata.timing.total_seconds = elapsed around downstream, rounded to
    * 2 decimals like the reference. Ref: injectors.py:115-133.
    */
  def timing(implicit ec: ExecutionContext): Middleware = { (ex, next) =>
    val start = System.nanoTime()
    next(ex).map { res =>
      val secs = math.round((System.nanoTime() - start) / 1e9 * 100.0) / 100.0
      val prior = res.metadata.get("timing") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _                  => Map.empty[String, Any]
      }
      res.withMeta("timing", prior + ("total_seconds" -> secs))
    }
  }

  /** metadata.executor_identity = hostname/pid/thread/executor-id/start-time.
    * Ref: injectors.py:136-169. Values are resolved once per chain build
    * (per partition), like the reference's per-instance __init__.
    */
  def workerIdentity(): Middleware = {
    val identity: Map[String, Any] = Map(
      "hostname" -> (try InetAddress.getLocalHost.getHostName catch { case _: Exception => "unknown" }),
      "pid" -> ProcessHandle.current().pid(),
      "executor_id" -> sys.env.getOrElse("SPARK_EXECUTOR_ID",
        try org.apache.spark.SparkEnv.get.executorId catch { case _: Throwable => null }),
      "worker_process_start_time" -> Instant.now().toString)
    (ex, next) => {
      val merged = ex.metadata.get("executor_identity") match {
        case Some(m: Map[_, _]) => identity ++ m.asInstanceOf[Map[String, Any]]
        case _                  => identity + ("thread_id" -> Thread.currentThread().getId)
      }
      next(ex.withMeta("executor_identity", merged))
    }
  }

  /** metadata.connection_warmup from the transport engine's diagnostics.
    * Ref: injectors.py:172-199. Auto-appended when transport.diagnostics=true.
    */
  def transportDiagnostics(engine: TransportEngine): Middleware = { (ex, next) =>
    next(ex.withMeta("connection_warmup", engine.diagnostics))
  }
}
