package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import graft.config.RetryConfig
import graft.middleware.{Injectors, Interceptors, Middleware, TokenSource}
import graft.model._

/** Unit tests for the middleware chain — mirrors the reference's per-
  * middleware unit layer (ref: tests/unit/middleware, docs/middleware.md:163-175):
  * each middleware exercised against a mock `next`.
  */
class MiddlewareSpec extends AnyFunSuite with Matchers {
  implicit val ec: ExecutionContext = ExecutionContext.global
  private def run(f: Future[RequestExchange]): RequestExchange = Await.result(f, 30.seconds)
  private val ctx = RequestContext(url = "http://x/api", method = "GET")

  private def okNext(status: Int = 200, body: String = """{"ok":true}"""): Middleware.Next =
    ex => Future.successful(ex.copy(
      response = Some(TransportResponse(Some(status), Map.empty, body.getBytes("UTF-8"))),
      success = Some(status < 500)))

  test("chain preserves configured order (outermost first)") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def tag(name: String): Middleware.Middleware = (ex, next) => {
      order += s"$name-in"; next(ex).map { r => order += s"$name-out"; r }
    }
    val chained = Middleware.chain(Seq(tag("a"), tag("b"), tag("c")), okNext())
    run(chained(RequestExchange(ctx)))
    order.toSeq shouldBe Seq("a-in", "b-in", "c-in", "c-out", "b-out", "a-out")
  }

  test("headerAuth adds Basic base64 credentials (injectors.py:49-67)") {
    var seen: Option[String] = None
    val next: Middleware.Next = ex => { seen = ex.context.headers.get("Authorization"); okNext()(ex) }
    run(Injectors.headerAuth("user", "pass")(RequestExchange(ctx), next))
    seen shouldBe Some("Basic " + java.util.Base64.getEncoder.encodeToString("user:pass".getBytes))
  }

  test("bearerToken injects token and telemetry (injectors.py:23-46)") {
    val fake = new TokenSource {
      def tokenValue()(implicit ec: ExecutionContext): Future[String] = Future.successful("fake-token")
      def telemetry: Map[String, Any] = Map("provider" -> "Fake")
    }
    var seen: Option[String] = None
    val next: Middleware.Next = ex => { seen = ex.context.headers.get("Authorization"); okNext()(ex) }
    val out = run(Injectors.bearerToken(fake).apply(RequestExchange(ctx), next))
    seen shouldBe Some("Bearer fake-token")
    out.metadata("token_provider") shouldBe Map("provider" -> "Fake")
  }

  test("paramInjector copies mapped row columns into params (injectors.py:70-87)") {
    val c = ctx.copy(paramMapping = Map("patient" -> "patient_id"))
    var seen: Map[String, String] = Map.empty
    val next: Middleware.Next = ex => { seen = ex.context.params; okNext()(ex) }
    run(Injectors.paramInjector(RequestExchange(c, row = Map("patient_id" -> "P42")), next))
    seen shouldBe Map("patient" -> "P42")
  }

  test("logging records -> and <- lines (injectors.py:90-112)") {
    val out = run(Injectors.logging.apply(RequestExchange(ctx), okNext(201)))
    val logs = out.metadata("logs").asInstanceOf[Seq[String]]
    logs.head shouldBe "-> GET http://x/api"
    logs.last shouldBe "<- 201 http://x/api"
  }

  test("logging records FAILED on transport error") {
    val failNext: Middleware.Next = ex => Future.successful(ex.copy(
      response = Some(TransportResponse(None, error = Some("ConnectException: refused"))),
      success = Some(false), errorMessage = Some("ConnectException: refused")))
    val out = run(Injectors.logging.apply(RequestExchange(ctx), failNext))
    val logs = out.metadata("logs").asInstanceOf[Seq[String]]
    logs.last should startWith("<- FAILED http://x/api")
  }

  test("timing records total_seconds (injectors.py:115-133)") {
    val out = run(Injectors.timing.apply(RequestExchange(ctx), okNext()))
    val timing = out.metadata("timing").asInstanceOf[Map[String, Any]]
    timing("total_seconds").asInstanceOf[Double] should be >= 0.0
  }

  test("jsonBody decodes body, probes validity, upgrades success when status<400") {
    val out = run(Interceptors.jsonBody.apply(RequestExchange(ctx), okNext(200, """{"a":1}""")))
    out.bodyText shouldBe Some("""{"a":1}""")
    out.metadata("json").asInstanceOf[Map[String, Any]]("valid") shouldBe true
    out.success shouldBe Some(true)
  }

  test("jsonBody flags invalid JSON but keeps success semantics (interceptors.py:130-164)") {
    val out = run(Interceptors.jsonBody.apply(RequestExchange(ctx), okNext(200, "not json")))
    out.metadata("json").asInstanceOf[Map[String, Any]]("valid") shouldBe false
    out.success shouldBe Some(true) // 200 < 400
  }

  test("jsonBody does NOT upgrade success for 4xx (quirk Q11: terminal status<500 stands)") {
    val out = run(Interceptors.jsonBody.apply(RequestExchange(ctx), okNext(404, """{"error":"x"}""")))
    out.success shouldBe Some(true) // 404 < 500 at terminal; json middleware leaves it
  }

  test("retry passes through on success, attempts=1 (interceptors.py:64-99)") {
    var calls = 0
    val next: Middleware.Next = ex => { calls += 1; okNext()(ex) }
    val out = run(Interceptors.retry(RetryConfig(maxAttempts = 3)).apply(RequestExchange(ctx), next))
    calls shouldBe 1
    out.attempts shouldBe 1
    out.success shouldBe Some(true)
  }

  test("retry retries retryable status then succeeds") {
    var calls = 0
    val next: Middleware.Next = ex => {
      calls += 1
      if (calls < 3) okNext(503, """{"e":1}""")(ex) else okNext(200)(ex)
    }
    val cfg = RetryConfig(maxAttempts = 5, baseDelaySeconds = 0.01, maxDelaySeconds = 0.05)
    val out = run(Interceptors.retry(cfg).apply(RequestExchange(ctx), next))
    calls shouldBe 3
    out.attempts shouldBe 3
    out.success shouldBe Some(true)
  }

  test("retry exhaustion sets success=false + retry_attempts (interceptors.py:86-99)") {
    val cfg = RetryConfig(maxAttempts = 3, baseDelaySeconds = 0.01, maxDelaySeconds = 0.02)
    val out = run(Interceptors.retry(cfg).apply(RequestExchange(ctx), okNext(503)))
    out.attempts shouldBe 3
    out.success shouldBe Some(false)
    out.errorMessage.get should include("Retry attempts exhausted (HTTP 503) after 3 attempts")
    out.metadata("retry_attempts") shouldBe 3
  }

  test("retry retries retryable transport errors then succeeds (interceptors.py:37-49)") {
    var calls = 0
    val next: Middleware.Next = ex => {
      calls += 1
      if (calls < 3) Future.successful(ex.copy(
        response = Some(TransportResponse(None,
          error = Some("ConnectException: connection refused to host"))),
        success = Some(false),
        errorMessage = Some("ConnectException: connection refused to host")))
      else okNext(200)(ex)
    }
    val cfg = RetryConfig(maxAttempts = 5, baseDelaySeconds = 0.01, maxDelaySeconds = 0.05)
    val out = run(Interceptors.retry(cfg).apply(RequestExchange(ctx), next))
    calls shouldBe 3
    out.success shouldBe Some(true)
  }

  test("retry exhausts on persistent transport errors with the exhausted message") {
    val next: Middleware.Next = ex => Future.successful(ex.copy(
      response = Some(TransportResponse(None,
        error = Some("HttpTimeoutException: request timed out"))),
      success = Some(false)))
    val cfg = RetryConfig(maxAttempts = 3, baseDelaySeconds = 0.01, maxDelaySeconds = 0.02)
    val out = run(Interceptors.retry(cfg).apply(RequestExchange(ctx), next))
    out.success shouldBe Some(false)
    out.errorMessage.get should include("Retry attempts exhausted: HttpTimeoutException")
    out.metadata("retry_attempts") shouldBe 3
  }

  test("retry does NOT retry non-retryable transport errors (DNS, TLS)") {
    var calls = 0
    val next: Middleware.Next = ex => {
      calls += 1
      Future.successful(ex.copy(
        response = Some(TransportResponse(None,
          error = Some("SSLHandshakeException: PKIX path building failed"))),
        success = Some(false)))
    }
    val out = run(Interceptors.retry(RetryConfig(maxAttempts = 5)).apply(RequestExchange(ctx), next))
    calls shouldBe 1
    out.success shouldBe Some(false)
  }

  test("retry does not retry non-retryable status (404)") {
    var calls = 0
    val next: Middleware.Next = ex => { calls += 1; okNext(404)(ex) }
    val out = run(Interceptors.retry(RetryConfig(maxAttempts = 5)).apply(RequestExchange(ctx), next))
    calls shouldBe 1
  }

  test("backoff delay is bounded by min(max, base*2^n) (interceptors.py:57-62)") {
    for (attempt <- 1 to 10) {
      val d = Middleware.backoffDelay(attempt, 0.1, 2.0)
      d should be >= 0.0
      d should be <= math.min(2.0, 0.1 * math.pow(2, attempt))
    }
  }
}
