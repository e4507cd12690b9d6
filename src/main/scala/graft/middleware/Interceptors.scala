package graft.middleware

import scala.concurrent.{ExecutionContext, Future}

import graft.config.RetryConfig
import graft.model.RequestExchange
import graft.util.Json
import Middleware._

/** Interceptors — middleware that may alter control flow.
  * Ref: src/request_execution/middleware/interceptors.py.
  */
object Interceptors {

  /** Retry on status ∈ retryStatusCodes with full-jitter exponential backoff.
    * Faithful to interceptors.py:18-127:
    *  - sets `attempts = n` on every attempt;
    *  - logs "[RetryMiddleware] Attempt n/max -> METHOD url" per attempt and
    *    "Got retryable HTTP s on attempt n" per retryable status;
    *  - on exhaustion: success=false,
    *    error "Retry attempts exhausted (HTTP s) after n attempts",
    *    metadata.retry_attempts = n;
    *  - retryable transport errors (connection/timeout — the analog of the
    *    reference's __is_retryable_exception set, interceptors.py:37-49:
    *    ClientConnectionError/ClientPayloadError/ServerTimeoutError/
    *    TimeoutError; our never-throw engine surfaces them as
    *    error-responses with status null): retried like a retryable status;
    *    on exhaustion success=false with "Retry attempts exhausted: ...".
    *    Without this, one transient reset would land a success=false bronze
    *    row that the anti-join checkpoint then treats as done forever;
    *  - other transport errors (DNS, TLS, malformed URL): return downstream
    *    result unchanged (non-retryable, matching the reference);
    *  - downstream exceptions: non-retryable → success=false with
    *    "Non-retryable exception: ..." (the JVM engine never throws, so this
    *    is defensive parity with the reference's except-branch).
    */
  private val retryableTransportError =
    ("(?i)(ConnectException|HttpConnectTimeoutException|HttpTimeoutException|" +
      "connection reset|connection refused|timed out|header parser received no bytes|" +
      "EOFException|goaway)").r.unanchored

  def retry(cfg: RetryConfig)(implicit ec: ExecutionContext): Middleware = { (ex0, next) =>
    def attemptLoop(ex: RequestExchange, attempt: Int): Future[RequestExchange] = {
      val started = ex.copy(attempts = attempt).withLog(
        s"[RetryMiddleware] Attempt $attempt/${cfg.maxAttempts} -> " +
          s"${ex.context.method} ${ex.context.url}")
      next(started).transformWith {
        case scala.util.Success(res) =>
          val transportError =
            if (res.statusCode.isEmpty)
              res.response.flatMap(_.error).filter(retryableTransportError.matches(_))
            else None
          (res.statusCode, transportError) match {
            case (Some(status), _) if cfg.retryStatusCodes.contains(status) =>
              val logged = res.withLog(
                s"[RetryMiddleware] Got retryable HTTP $status on attempt $attempt")
              if (attempt < cfg.maxAttempts)
                delay(backoffDelay(attempt, cfg.baseDelaySeconds, cfg.maxDelaySeconds))
                  .flatMap(_ => attemptLoop(logged, attempt + 1))
              else
                Future.successful(logged.copy(
                  success = Some(false),
                  errorMessage = Some(
                    s"Retry attempts exhausted (HTTP $status) after $attempt attempts"))
                  .withMeta("retry_attempts", attempt))
            case (None, Some(err)) =>
              val logged = res.withLog(
                s"[RetryMiddleware] Retryable exception on attempt $attempt: $err")
              if (attempt < cfg.maxAttempts)
                delay(backoffDelay(attempt, cfg.baseDelaySeconds, cfg.maxDelaySeconds))
                  .flatMap(_ => attemptLoop(logged, attempt + 1))
              else
                Future.successful(logged.copy(
                  success = Some(false),
                  errorMessage = Some(s"Retry attempts exhausted: $err"))
                  .withMeta("retry_attempts", attempt))
            case _ => Future.successful(res)
          }
        case scala.util.Failure(exc) =>
          val reason = s"Non-retryable exception: ${exc.getClass.getSimpleName}: ${exc.getMessage}"
          Future.successful(started.withLog(s"[RetryMiddleware] $reason").copy(
            success = Some(false), errorMessage = Some(reason))
            .withMeta("retry_attempts", attempt))
      }
    }
    attemptLoop(ex0, 1)
  }

  /** Decode body to text, probe JSON validity into metadata.json, and set
    * success=true when status < 400 (leaving success untouched otherwise —
    * quirk Q11's order-dependent semantics). Ref: interceptors.py:130-164.
    */
  def jsonBody(implicit ec: ExecutionContext): Middleware = { (ex, next) =>
    next(ex).map { res =>
      res.response match {
        case Some(resp) if resp.body.nonEmpty || resp.status.isDefined =>
          try {
            val text = new String(resp.body, java.nio.charset.StandardCharsets.UTF_8)
            val probe = Json.tryParse(text) match {
              case Right(_)  => Map("valid" -> true, "error" -> null)
              case Left(err) => Map("valid" -> false, "error" -> err)
            }
            val withBody = res.copy(bodyText = Some(text)).withMeta("json", probe)
            if (withBody.statusCode.exists(_ < 400)) withBody.copy(success = Some(true))
            else withBody
          } catch {
            case e: Exception =>
              res.copy(success = Some(false),
                errorMessage = Some(s"Body binary to string conversion error: ${e.getMessage}"))
          }
        case _ => res
      }
    }
  }
}
