package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
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

  test("watermark state survives restart and drops late rows (append mode)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-wm-src").resolve("in").toString
    val ckpt = Files.createTempDirectory("graft-wm-ckpt").toString

    def ts(m: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $m:00")
    def write(rows: Seq[(String, java.sql.Timestamp)]): Unit =
      rows.toDF("user", "ts").coalesce(1).write.mode("append").parquet(src)

    // file sink: supports checkpoint recovery (memory sink does not)
    val outDir = Files.createTempDirectory("graft-wm-out").resolve("agg").toString
    def run(): Unit = {
      val st = spark.readStream.schema("user STRING, ts TIMESTAMP").parquet(src)
      val agg = st.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes"), col("user"))
        .agg(count(lit(1)).as("events"))
        .select(date_format(col("window.start"), "HH:mm").as("wstart"),
          col("user"), col("events"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .trigger(Trigger.AvailableNow()).format("parquet").start()
      q.awaitTermination()
    }

    // Run 1: three events in W1 [00:00, 00:10) plus one at 01:00 that
    // advances the watermark to 00:50 at batch end (checkpointed).
    write(Seq(("u", ts("00:01")), ("u", ts("00:02")), ("u", ts("00:03")),
      ("u", ts("01:00"))))
    run()

    // Run 2 (restart from the same checkpoint): a LATE W1 event at 00:04 —
    // behind the persisted 00:50 watermark — must be dropped; W1 finalizes
    // and emits with the original 3 events only.
    write(Seq(("u", ts("00:04")), ("u", ts("01:05"))))
    run()

    val emitted = spark.read.parquet(outDir)
      .select("wstart", "events").as[(String, Long)].collect().toMap
    emitted("00:00") shouldBe 3L // late 00:04 row dropped by the watermark
  }

  test("append-mode drains emit every finalized window and EVICT state (bounded by the watermark)") {
    import graft.streaming.StreamOps
    // The complete-mode drain keeps one state row per window ever seen;
    // the append twin must (a) produce the identical result on a bounded
    // backlog and (b) finish with state bounded by the UNFINALIZED window
    // set — here only the far-future sentinel's window (null keys), never
    // the real windows, which the watermark finalized and evicted.
    val events = s"$sfDir/events.parquet"
    val (agg, aggState) = StreamOps.windowedEventAggAppendWithState(spark, events)
    val complete = StreamOps.windowedEventAgg(spark, events,
      queryName = s"spec_complete_agg_${System.nanoTime()}")
    val key = Seq("event_type", "window_start")
    val appendRows = agg.orderBy(key.map(col): _*).collect().toSeq
    val completeRows = complete.orderBy(key.map(col): _*).collect().toSeq
    appendRows shouldBe completeRows
    appendRows.size should be > 10 // real windows were emitted...
    // ...but did NOT stay in state: only the sentinel's open window may
    // remain (complete mode would hold all of them)
    aggState should be >= 0L
    aggState should be < 5L

    val (ohlc, ohlcState) = StreamOps.streamingOhlcAppendWithState(spark, events)
    ohlc.count() should be > 10L
    ohlcState should be >= 0L
    ohlcState should be < 5L
  }

  test("x53/x89 append-drain routes: state bounded, totals match the complete-mode drains") {
    import graft.streaming.StreamOps
    val events = s"$sfDir/events.parquet"
    // x89's route: the per-(day, key) window log — state must end bounded
    // by the sentinel's open window, never one counter per key (the
    // complete-mode shape the round-9 migration retired from the gate).
    val (log, logState) = StreamOps.hotKeyWindowLogWithState(spark, events, "user_id")
    logState should be >= 0L
    logState should be < 5L
    // global counts from the log == the complete-mode drain's counts
    val fromLog = log.groupBy("key")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(20).collect().toSeq
    val complete = StreamOps.streamingHotKeys(spark, events, "user_id", 20,
      queryName = s"spec_hotkeys_${System.nanoTime()}").collect().toSeq
    fromLog.map(_.toSeq) shouldBe complete.map(_.toSeq)

    // x53's route: per-(day, segment) enrichment log, same bound.
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val (_, sseState) = StreamOps.streamStaticEnrichWindowedAppendWithState(
      spark, events, dim, "user_id", "c_custkey", "c_mktsegment")
    sseState should be >= 0L
    sseState should be < 10L
  }

  test("x149 chained stateful ops: dedup + windowed count match the batch count-distinct; state bounded") {
    import graft.streaming.StreamOps
    val events = s"$sfDir/events.parquet"
    val (out, stateRows) = StreamOps.streamingDailyActivesAppendWithState(
      spark, events)
    // batch truth: count(DISTINCT user) per day over the normalized stream
    val truth = graft.queries.QueryDef.events(spark, sfDir)
      .select(expr("div(unix_micros(ts), 86400000000)").as("bucket"),
        col("user_id"))
      .groupBy("bucket")
      .agg(count_distinct(col("user_id")).as("actives"))
    out.orderBy("bucket").collect().map(_.toSeq).toSeq shouldBe
      truth.orderBy("bucket").collect().map(_.toSeq).toSeq
    // final state: only the sentinel's open day across BOTH operators
    stateRows should be >= 0L
    stateRows should be < 5L
  }

  test("silver layer runs over a streaming bronze source (typed from_json projection)") {
    val server = new MockApiServer().start()
    val bronzeDir = Files.createTempDirectory("stream-silver-bronze").toString
    val outDir = Files.createTempDirectory("stream-silver-out").toString
    val ckpt = Files.createTempDirectory("stream-silver-ckpt").toString
    try {
      // stage a real bronze dir through the batch DSv2 read path
      spark.read.format("graft-http")
        .option("url", s"${server.baseUrl}/api/data")
        .option("id_start", 1).option("id_end", 41)
        .load()
        .write.mode("overwrite").parquet(bronzeDir)

      // silver is a plain DataFrame transform, so the SAME code runs on a
      // readStream bronze source — from_json stays codegen'd, no shuffle
      val bronzeStream = spark.readStream
        .schema(graft.model.BronzeSchema.schema).parquet(bronzeDir)
      val q = graft.orchestration.SilverLayer
        .fromBronze(bronzeStream, "id STRING, customer STRING, status STRING")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val silver = spark.read.parquet(outDir)
      silver.count() shouldBe 40L
      silver.columns.toSet shouldBe
        Set("request_id", "success", "status_code", "id", "customer", "status")
      val r7 = silver.filter(col("request_id") === "7").head()
      r7.getAs[String]("id") shouldBe "7"
      r7.getAs[String]("status") shouldBe "ok"
    } finally server.stop()
  }

  test("stream-static enrichment joins each micro-batch onto the dim snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sse-spec")
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.004, "view"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2.0, "view"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 3.0, "click"),
      (9L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 9.0, "view")) // no dim row -> dropped
      .toDF("user_id", "ts", "value", "event_type")
    events.write.mode("overwrite").parquet(dir.toString)
    val dim = Seq((1L, "GOLD"), (2L, "SILVER"), (3L, "GOLD"))
      .toDF("c_custkey", "c_mktsegment")
    val out = graft.streaming.StreamOps.streamStaticEnrich(spark, dir.toString,
        dim, "user_id", "c_custkey", "c_mktsegment",
        queryName = s"sse_spec_${System.nanoTime()}")
      .orderBy("c_mktsegment").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq shouldBe Seq(
      ("GOLD", 2L, 300L), // floor(1.004*100+.5)=100 + 200
      ("SILVER", 1L, 300L))
  }
}
