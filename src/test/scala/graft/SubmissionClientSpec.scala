package graft

import java.net.InetSocketAddress
import java.time.Duration
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.orchestration.SubmissionClient
import graft.orchestration.SubmissionClient.{SubmissionFailed, SubmissionRequest}
import graft.util.Json

/** SubmissionClient vs an in-JVM mock of the Spark standalone master REST
  * API (create/status/kill), mirroring the reference DAG's submit + poll
  * loop (ref: dags/demo_pipelines_dag.py:85-177): SUBMITTED → RUNNING →
  * FINISHED resolves; FAILED raises; kill is acknowledged; a rejected
  * submission raises with the master's message.
  */
class SubmissionClientSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val statusCalls = new AtomicInteger(0)
  @volatile private var lastCreatePayload: String = ""
  @volatile private var killed: Set[String] = Set.empty

  private def respond(ex: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 16)
    server.createContext("/v1/submissions/create", (ex: HttpExchange) => {
      lastCreatePayload = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val appName = Json.str(Json.parse(lastCreatePayload), "mainClass").getOrElse("")
      val body =
        if (appName.contains("Reject"))
          """{"action":"CreateSubmissionResponse","success":false,"message":"quota exceeded"}"""
        else
          """{"action":"CreateSubmissionResponse","success":true,"submissionId":"driver-20260812-0001","serverSparkVersion":"4.1.2"}"""
      respond(ex, body)
    })
    server.createContext("/v1/submissions/status/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.split("/").last
      val state =
        if (id == "driver-fails") "FAILED"
        else if (id == "driver-stuck") "SUBMITTED"
        else if (killed(id)) "KILLED"
        else statusCalls.incrementAndGet() match {
          case 1 => "SUBMITTED"
          case 2 => "RUNNING"
          case _ => "FINISHED"
        }
      respond(ex,
        s"""{"action":"SubmissionStatusResponse","submissionId":"$id","success":true,"driverState":"$state","workerHostPort":"10.0.0.5:41234"}""")
    })
    server.createContext("/v1/submissions/kill/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.split("/").last
      killed += id
      respond(ex,
        s"""{"action":"KillSubmissionResponse","submissionId":"$id","success":true}""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private val req = SubmissionRequest(
    appResource = "/opt/spark/app/graft.jar",
    mainClass = "graft.SparkEntry",
    appArgs = Seq("--sf", "0.01"),
    sparkProperties = Map(
      "spark.master" -> "spark://spark-master:7077",
      "spark.submit.deployMode" -> "cluster",
      "spark.app.name" -> "graft-pipeline"))

  test("submit posts a CreateSubmissionRequest and returns the master's id") {
    val id = SubmissionClient.submit(base, req)
    id shouldBe "driver-20260812-0001"
    val sent = Json.parse(lastCreatePayload)
    Json.str(sent, "action") shouldBe Some("CreateSubmissionRequest")
    Json.str(sent, "appResource") shouldBe Some("/opt/spark/app/graft.jar")
    Json.str(sent, "mainClass") shouldBe Some("graft.SparkEntry")
    // every spark property rides in the payload (REST bypasses spark-defaults)
    Json.strMap(sent, "sparkProperties")("spark.submit.deployMode") shouldBe "cluster"
    sent.get("appArgs").get(1).asText() shouldBe "0.01"
  }

  test("baseProperties carry everything a defaults-less REST submission needs") {
    val props = SubmissionClient.baseProperties("spark://m:7077", "graft-job")
    props("spark.master") shouldBe "spark://m:7077"
    props("spark.submit.deployMode") shouldBe "cluster"
    // Java 17 opens reach BOTH sides, or the driver dies at startup
    props("spark.driver.extraJavaOptions") should include("--add-opens=java.base/sun.nio.ch")
    props("spark.executor.extraJavaOptions") shouldBe props("spark.driver.extraJavaOptions")
    // job-specific overrides win on merge
    (props ++ Map("spark.app.name" -> "x"))("spark.app.name") shouldBe "x"
  }

  test("awaitCompletion polls through SUBMITTED/RUNNING to FINISHED") {
    statusCalls.set(0)
    val done = SubmissionClient.awaitCompletion(base, "driver-20260812-0001",
      pollInterval = Duration.ofMillis(20), timeout = Duration.ofSeconds(5))
    done.driverState shouldBe "FINISHED"
    done.workerHostPort shouldBe Some("10.0.0.5:41234")
    statusCalls.get() should be >= 3
  }

  test("a FAILED driver state raises, like the reference wait loop") {
    val e = intercept[SubmissionFailed] {
      SubmissionClient.awaitCompletion(base, "driver-fails",
        pollInterval = Duration.ofMillis(20), timeout = Duration.ofSeconds(5))
    }
    e.getMessage should include("FAILED")
  }

  test("a rejected submission raises with the master's message") {
    val e = intercept[SubmissionFailed] {
      SubmissionClient.submit(base, req.copy(mainClass = "graft.RejectMe"))
    }
    e.getMessage should include("quota exceeded")
  }

  test("kill is acknowledged and the driver lands in KILLED") {
    SubmissionClient.kill(base, "driver-k1") shouldBe true
    SubmissionClient.status(base, "driver-k1").driverState shouldBe "KILLED"
  }

  test("polling a never-finishing driver times out with the last state") {
    val e = intercept[SubmissionFailed] {
      SubmissionClient.awaitCompletion(base, "driver-stuck",
        pollInterval = Duration.ofMillis(20), timeout = Duration.ofMillis(100))
    }
    e.getMessage should include("timed out")
    e.getMessage should include("SUBMITTED")
  }
}
