package graft.middleware

import java.util.concurrent.{Executors, ScheduledExecutorService, ThreadLocalRandom, TimeUnit}
import scala.concurrent.{ExecutionContext, Future, Promise}

import graft.model.RequestExchange

/** Middleware = async row-level "scalar function" of this engine:
  * `(exchange, next) => Future[exchange]`, chained by nesting
  * (ref: src/request_execution/middleware/pipeline.py:52-87).
  * Interceptors may alter control flow (call next 0..n times); injectors
  * call next exactly once (ref: docs/middleware.md:6-29).
  */
object Middleware {
  type Next = RequestExchange => Future[RequestExchange]
  type Middleware = (RequestExchange, Next) => Future[RequestExchange]

  /** Fold the ordered list into a single Next: first element is outermost.
    * An immutable per-partition chain (fixes quirk Q6 — the reference
    * mutates a shared factory list per partition call).
    */
  def chain(middlewares: Seq[Middleware], terminal: Next): Next =
    middlewares.foldRight(terminal) { (mw, next) => ex => mw(ex, next) }

  /** Shared daemon scheduler for non-blocking retry backoff. */
  lazy val scheduler: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-scheduler"); t.setDaemon(true); t
    }

  def delay(seconds: Double)(implicit ec: ExecutionContext): Future[Unit] = {
    val p = Promise[Unit]()
    scheduler.schedule(
      new Runnable { def run(): Unit = p.success(()) },
      (seconds * 1000).toLong, TimeUnit.MILLISECONDS)
    p.future
  }

  /** Full-jitter exponential backoff delay: uniform(0, min(max, base*2^n)).
    * Ref: interceptors.py:57-62.
    */
  def backoffDelay(attempt: Int, baseDelay: Double, maxDelay: Double): Double = {
    val exponential = baseDelay * math.pow(2.0, attempt)
    ThreadLocalRandom.current().nextDouble(0.0, math.max(1e-9, math.min(maxDelay, exponential)))
  }
}
