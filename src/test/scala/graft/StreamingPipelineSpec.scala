package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.config._
import graft.streaming.StreamingPipeline
import graft.testkit.MockApiServer

/** Streaming foreachBatch pipeline: file stream → anti-join → HTTP →
  * bronze append, idempotent across micro-batches AND checkpoint loss.
  */
class StreamingPipelineSpec extends SparkSpec with Matchers {

  private def writeIds(dir: String, name: String, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"c$i")).toDF("order_id", "cust")
      .coalesce(1).write.mode("append").parquet(s"$dir/$name")
  }

  private def cfg(server: MockApiServer, sink: String) = PipelineConfig(
    endpoint = EndpointConfig("stream", server.baseUrl, "/api/data"),
    transport = TransportConfig(retryNonIdempotent = true),
    auth = NoAuth,
    middleware = Seq(JsonBodyConfig),
    tables = TablesConfig(None, SinkTableConfig(sink, "demo", mode = "append"),
      Seq(ColumnMapping("request_id", Some("id")))),
    execution = ExecutionConfig(numPartitions = 4, batchSize = 1000L,
      maxAttempts = 2, maxConcurrentRequests = 16))

  test("streaming pipeline ingests the backlog, dedups on replay without a checkpoint") {
    val server = new MockApiServer().start()
    try {
      val srcDir = Files.createTempDirectory("graft-stream-src")
      val stageDir = srcDir.resolve("stage").toString
      writeIds(stageDir, "", 1 to 50)
      spark.sql("DROP TABLE IF EXISTS demo.stream_bronze")

      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema("order_id LONG, cust STRING")
          .parquet(stageDir)
        val h = StreamingPipeline.start(spark, cfg(server, "stream_bronze"),
          stream, sourceId = "order_id",
          queryName = s"stream_pipe_${System.nanoTime()}")
        try h.query.awaitTermination() finally h.close()
      }

      runOnce()
      val bronze = spark.table("demo.stream_bronze")
      bronze.count() shouldBe 50
      bronze.select("request_id").distinct().count() shouldBe 50

      // Second batch of files arrives: overlap 41..50 must be dropped by
      // the sink anti-join even though this run has a FRESH (absent)
      // checkpoint and re-reads everything.
      writeIds(stageDir, "", 41 to 60)
      runOnce()
      val after = spark.table("demo.stream_bronze")
      after.count() shouldBe 60
      after.select("request_id").distinct().count() shouldBe 60
      // every row actually went through the HTTP stage
      after.filter("success = true AND status_code = 200").count() shouldBe 60
    } finally server.stop()
  }
}
