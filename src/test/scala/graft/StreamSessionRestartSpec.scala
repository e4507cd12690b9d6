package graft

import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** Restart semantics for the timer-based sessionizer (x134, state v2
  * event-time timers on RocksDB): across a checkpointed restart the
  * ListState buffer and the armed timer must resume — a session whose
  * events span the restart merges into ONE row, closed sessions are not
  * re-emitted, and a session still inside its gap at shutdown stays open
  * until later event time proves it closed.
  */
class StreamSessionRestartSpec extends SparkSpec with Matchers {

  test("a session spanning a checkpointed restart merges; closed sessions don't re-emit") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val streamDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
    val H = 3600000000L // 1h in us
    def eventsFile(name: String, rows: Seq[(Long, Long, Double)]): Unit = {
      val tmp = s"$root/scratch-$name"
      rows.toDF("user_id", "t", "value")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(t)")).drop("t")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/$name.parquet"))
    }
    def sessions() = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("events")))
      .sortBy(t => (t._1, t._2)).toSeq

    // run 1: user 1 has an early session (closed by later event time) and
    // the START of a second session still inside its 4h gap at shutdown
    eventsFile("f1", Seq(
      (1L, 1 * H, 10.0), (1L, 2 * H, 10.0),   // session A: 1h-2h
      (1L, 10 * H, 10.0)))                    // session B starts at 10h
    StreamOps.sessionTimersToDir(spark, streamDir, outDir, ckpt,
      java.time.Duration.ofHours(4))
    sessions() shouldBe Seq((1L, 1 * H, 2 * H, 2L))
    // mid-stream statestore readback: the ListState buffer holds EXACTLY
    // the open session's events — session A's two rows left state when
    // it emitted; session B's single 10h event is still buffered
    def buffer() = StreamOps.sessionBufferFromState(spark, ckpt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    buffer() shouldBe Seq((1L, 10 * H, 1000L))

    // run 2 after restart: session B CONTINUES (12h is within 4h of 10h —
    // the restored ListState must merge), then a far row closes everything
    eventsFile("f2", Seq(
      (1L, 12 * H, 10.0),
      (2L, 100 * H, 10.0)))                   // pushes the watermark
    StreamOps.sessionTimersToDir(spark, streamDir, outDir, ckpt,
      java.time.Duration.ofHours(4))
    sessions() shouldBe Seq(
      (1L, 1 * H, 2 * H, 2L),                 // NOT re-emitted twice
      (1L, 10 * H, 12 * H, 2L))               // spans the restart, one row
    // after the close: user 1's buffer is EMPTY (both sessions emitted);
    // only user 2's watermark-pushing row is still open
    buffer() shouldBe Seq((2L, 100 * H, 1000L))
  }
}
