package graft.orchestration

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.util.Json

/** Cluster-submission client for the Spark standalone REST API — the JVM
  * analog of the reference's orchestrated submission path (ref:
  * dags/demo_pipelines_dag.py:85-177: POST /v1/submissions/create, then
  * poll /v1/submissions/status/&lt;id&gt; until a terminal driver state).
  *
  * The reference drives this from an Airflow task; here it is a plain
  * library object any scheduler (cron, Airflow's BashOperator, a CI job)
  * can call, so the "submit the pipeline to the cluster and wait" step is
  * part of the engine rather than a platform-only artifact.
  *
  * States follow the standalone master's DriverState: SUBMITTED/RUNNING
  * keep polling; FINISHED resolves; FAILED/ERROR/KILLED/RELAUNCHING raise
  * (same split as the reference's wait loop); anything unknown keeps
  * polling until the deadline.
  */
object SubmissionClient {

  /** One cluster submission: the payload of CreateSubmissionRequest.
    * `sparkProperties` must carry every setting the job needs — REST
    * submissions bypass spark-submit, so spark-defaults.conf is NOT loaded
    * (the reference documents the same caveat).
    */
  final case class SubmissionRequest(
      appResource: String,
      mainClass: String,
      appArgs: Seq[String] = Nil,
      sparkProperties: Map[String, String] = Map.empty,
      environmentVariables: Map[String, String] = Map.empty,
      clientSparkVersion: String = "4.1.2")

  final case class SubmissionStatus(
      submissionId: String,
      driverState: String,
      workerHostPort: Option[String],
      message: Option[String])

  final class SubmissionFailed(msg: String) extends RuntimeException(msg)

  private val TerminalFailures = Set("FAILED", "ERROR", "KILLED", "RELAUNCHING")

  private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  private def post(url: String, body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(30))
      .header("Content-Type", "application/json;charset=UTF-8")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    http.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  private def get(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(30)).GET().build()
    http.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  /** Submit; returns the master-assigned submission id. Raises
    * SubmissionFailed when the master answers success=false or omits the
    * id (both observed failure shapes of the real REST endpoint).
    */
  def submit(masterRestUrl: String, request: SubmissionRequest): String = {
    val payload = Json.write(scala.collection.immutable.ListMap(
      "action" -> "CreateSubmissionRequest",
      "appResource" -> request.appResource,
      "mainClass" -> request.mainClass,
      "appArgs" -> request.appArgs,
      "sparkProperties" -> request.sparkProperties,
      "environmentVariables" -> request.environmentVariables,
      "clientSparkVersion" -> request.clientSparkVersion))
    val node = Json.parse(post(s"$masterRestUrl/v1/submissions/create", payload))
    if (!Json.bool(node, "success").getOrElse(false))
      throw new SubmissionFailed("submission rejected: " +
        Json.str(node, "message").getOrElse("unknown error"))
    Json.str(node, "submissionId").getOrElse(
      throw new SubmissionFailed("no submissionId in master response"))
  }

  /** One status probe (GET /v1/submissions/status/&lt;id&gt;). */
  def status(masterRestUrl: String, submissionId: String): SubmissionStatus = {
    val node = Json.parse(get(s"$masterRestUrl/v1/submissions/status/$submissionId"))
    SubmissionStatus(
      submissionId = Json.str(node, "submissionId").getOrElse(submissionId),
      driverState = Json.str(node, "driverState").getOrElse("UNKNOWN"),
      workerHostPort = Json.str(node, "workerHostPort"),
      message = Json.str(node, "message"))
  }

  /** Request driver kill; returns true when the master accepted it. */
  def kill(masterRestUrl: String, submissionId: String): Boolean = {
    val node = Json.parse(post(s"$masterRestUrl/v1/submissions/kill/$submissionId", ""))
    Json.bool(node, "success").getOrElse(false)
  }

  /** Poll until FINISHED (returned), a terminal failure state (raises —
    * same classification as the reference's wait loop), or the deadline
    * (raises). Unknown states keep polling, like the reference.
    */
  def awaitCompletion(masterRestUrl: String, submissionId: String,
      pollInterval: Duration = Duration.ofSeconds(10),
      timeout: Duration = Duration.ofMinutes(10)): SubmissionStatus = {
    val deadline = System.nanoTime() + timeout.toNanos
    var last: SubmissionStatus = null
    while (true) {
      last = status(masterRestUrl, submissionId)
      last.driverState match {
        case "FINISHED" => return last
        case s if TerminalFailures(s) =>
          throw new SubmissionFailed(
            s"job $submissionId failed with state $s" +
              last.message.map(m => s": $m").getOrElse(""))
        case _ =>
          if (System.nanoTime() > deadline)
            throw new SubmissionFailed(
              s"job $submissionId timed out after ${timeout.getSeconds}s " +
                s"(last state ${last.driverState})")
          Thread.sleep(pollInterval.toMillis)
      }
    }
    last // unreachable
  }

  /** Baseline spark-property set for a REST submission — the settings the
    * reference DAG documents as REQUIRED in the payload because REST
    * submissions bypass spark-submit and never read spark-defaults.conf
    * (ref: dags/demo_pipelines_dag.py:44-81): cluster deploy mode against
    * the given master, and the Java-17 `--add-opens` flags Spark needs on
    * modern JVMs, applied to driver and executors. Merge job-specific
    * settings (warehouse, catalog, object-store credentials) on top.
    */
  def baseProperties(masterUrl: String, appName: String): Map[String, String] = {
    val java17Opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/sun.nio.ch",
      "java.base/sun.security.action")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    Map(
      "spark.master" -> masterUrl,
      "spark.app.name" -> appName,
      "spark.submit.deployMode" -> "cluster",
      "spark.driver.supervise" -> "false",
      "spark.driver.extraJavaOptions" -> java17Opens,
      "spark.executor.extraJavaOptions" -> java17Opens)
  }

  /** Submit-and-wait in one call — the whole reference Airflow task. */
  def run(masterRestUrl: String, request: SubmissionRequest,
      pollInterval: Duration = Duration.ofSeconds(10),
      timeout: Duration = Duration.ofMinutes(10)): SubmissionStatus = {
    val id = submit(masterRestUrl, request)
    awaitCompletion(masterRestUrl, id, pollInterval, timeout)
  }
}
