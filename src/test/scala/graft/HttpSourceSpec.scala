package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.matchers.should.Matchers

import graft.testkit.MockApiServer

/** DataSource V2 `graft-http` source: short-name registration, id-range
  * partitioning, bronze rows, and reader-side column pruning.
  */
class HttpSourceSpec extends SparkSpec with Matchers {

  test("format(graft-http) reads one bronze row per id in [start, end)") {
    val server = new MockApiServer().start()
    try {
      val df = spark.read.format("graft-http")
        .option("url", s"${server.baseUrl}/api/data")
        .option("id_start", 5).option("id_end", 55)
        .option("num_partitions", 4)
        .option("concurrency", 8)
        .load()
      val rows = df.select("request_id", "status_code", "success", "body_text").collect()
      rows.length shouldBe 50
      rows.map(_.getString(0)).toSet shouldBe (5 until 55).map(_.toString).toSet
      all(rows.map(_.getInt(1))) shouldBe 200
      all(rows.map(_.getBoolean(2))) shouldBe true
      rows.find(_.getString(0) == "7").get.getString(3) shouldBe
        """{"id":"7","customer":"","status":"ok"}"""
    } finally server.stop()
  }

  test("column pruning reaches the scan (ReadSchema carries only selected columns)") {
    val server = new MockApiServer().start()
    try {
      val df = spark.read.format("graft-http")
        .option("url", s"${server.baseUrl}/api/data")
        .option("id_start", 0).option("id_end", 10)
        .load()
        .select("status_code")
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      plan should include("graft-http")
      plan should include("status_code")
      (plan should not).include("body_text")
      df.collect().length shouldBe 10
    } finally server.stop()
  }

  test("empty range plans at least one partition and returns zero rows") {
    val server = new MockApiServer().start()
    try {
      val df = spark.read.format("graft-http")
        .option("url", s"${server.baseUrl}/api/data")
        .option("id_start", 9).option("id_end", 9)
        .load()
      df.count() shouldBe 0L
    } finally server.stop()
  }

  test("dead endpoint yields bronze error rows, not task failures") {
    // never-throw transport contract carries into the DSv2 reader: a
    // connection-refused target produces success=false rows with the error
    // recorded, so one bad endpoint can't kill a 1000-task job
    val rows = spark.read.format("graft-http")
      .option("url", "http://127.0.0.1:1/api/nothing")
      .option("id_start", 0).option("id_end", 5)
      .option("timeout_seconds", 2)
      .load()
      .select("request_id", "status_code", "success", "error_message").collect()
    rows.length shouldBe 5
    all(rows.map(_.isNullAt(1))) shouldBe true
    all(rows.map(_.getBoolean(2))) shouldBe false
    all(rows.map(_.getString(3))) should include("ConnectException")
  }

  test("streaming read: offsets checkpoint, restart fetches nothing twice") {
    val server = new MockApiServer().start()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-http-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-http-out").toString
    def runStream(): Long = {
      val q = spark.readStream.format("graft-http")
        .option("url", s"${server.baseUrl}/api/data")
        .option("id_start", 100).option("id_end", 150)
        .option("num_partitions", 4)
        .load()
        .select("request_id", "status_code", "success")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    try {
      runStream() shouldBe 50L
      val served = server.totalRequests.get()
      // same checkpoint → offset log says [100,150) is done → zero re-fetch
      runStream() shouldBe 50L
      server.totalRequests.get() shouldBe served
    } finally server.stop()
  }

  test("ids_per_trigger caps each micro-batch (admission control)") {
    val server = new MockApiServer().start()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-http-ckpt2").toString
    val out = java.nio.file.Files.createTempDirectory("graft-http-out2").toString
    try {
      val q = spark.readStream.format("graft-http")
        .option("url", s"${server.baseUrl}/api/data")
        .option("id_start", 0).option("id_end", 50)
        .option("ids_per_trigger", 20)
        .option("num_partitions", 2)
        .load()
        .select("request_id", "status_code")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count() shouldBe 50L
      // 50 ids at 20/trigger → ceil(50/20) = 3 committed micro-batches
      val batches = new java.io.File(s"$ckpt/commits").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      batches shouldBe 3
    } finally server.stop()
  }

  test("write path POSTs one JSON body per row (reverse ETL)") {
    val server = new MockApiServer().start()
    try {
      spark.range(100).selectExpr("id", "concat('user_', id) AS name")
        .coalesce(4)
        .write.format("graft-http").mode("append")
        .option("url", s"${server.baseUrl}/api/echo_body")
        .option("concurrency", 8)
        .save()
      // 100 row POSTs + 1 connection-warmup GET from the fresh engine
      server.totalRequests.get() shouldBe 101
    } finally server.stop()
  }

  test("write path renders request_template bodies ({{column}} substitution)") {
    val server = new MockApiServer().start()
    try {
      spark.range(3).selectExpr("id", "concat('n', id) AS name")
        .coalesce(1)
        .write.format("graft-http").mode("append")
        .option("url", s"${server.baseUrl}/api/echo_body")
        .option("request_template", """{"key":"{{id}}","label":"{{name}}","missing":"{{nope}}"}""")
        .save()
      val bodies = server.receivedBodies.toArray(Array.empty[String]).sorted
      bodies should contain("""{"key":"0","label":"n0","missing":""}""")
      bodies should contain("""{"key":"2","label":"n2","missing":""}""")
    } finally server.stop()
  }

  test("write to a dead endpoint fails the job at commit (fail_on_errors default)") {
    val e = intercept[Exception] {
      spark.range(3).coalesce(1)
        .write.format("graft-http").mode("append")
        .option("url", "http://127.0.0.1:1/api/void")
        .option("timeout_seconds", 2)
        .save()
    }
    e.toString + Option(e.getCause).mkString should include("requests failed")
  }

  test("fail_on_errors=false records failures without failing the job") {
    spark.range(3).coalesce(1)
      .write.format("graft-http").mode("append")
      .option("url", "http://127.0.0.1:1/api/void")
      .option("timeout_seconds", 2)
      .option("fail_on_errors", "false")
      .save()
  }

  test("SQL DDL access: CREATE TABLE ... USING graft-http, then plain SELECT") {
    val server = new MockApiServer().start()
    try {
      spark.sql("DROP TABLE IF EXISTS api_items")
      spark.sql(
        s"""CREATE TABLE api_items USING `graft-http` OPTIONS (
           |  url '${server.baseUrl}/api/data',
           |  id_start '1', id_end '21', num_partitions '2')""".stripMargin)
      val rows = spark.sql(
        "SELECT request_id, status_code FROM api_items ORDER BY CAST(request_id AS BIGINT)")
        .collect()
      rows.length shouldBe 20
      rows.head.getString(0) shouldBe "1"
      all(rows.map(_.getInt(1))) shouldBe 200
    } finally {
      spark.sql("DROP TABLE IF EXISTS api_items")
      server.stop()
    }
  }

  test("retry_attempts option wires the retry interceptor (flaky endpoint recovers)") {
    val server = new MockApiServer().start()
    try {
      val rows = spark.read.format("graft-http")
        .option("url", s"${server.baseUrl}/api/flaky")
        .option("id_start", 1).option("id_end", 6)
        .option("retry_attempts", 3)
        .load()
        .select("request_id", "status_code", "attempts").collect()
      rows.length shouldBe 5
      all(rows.map(_.getInt(1))) shouldBe 200
      all(rows.map(_.getInt(2))) shouldBe 2
    } finally server.stop()
  }
}
