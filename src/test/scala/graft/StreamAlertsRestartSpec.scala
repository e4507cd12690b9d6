package graft

import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** Restart semantics for the flatMapGroupsWithState alert operator
  * (x102): alert ordinals must CONTINUE across a checkpointed restart,
  * and already-emitted alerts must not be re-emitted.
  */
class StreamAlertsRestartSpec extends SparkSpec with Matchers {

  test("alert ordinals continue across a checkpointed restart, no re-emission") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-alerts").toString
    val streamDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))

    // FileStreamSource lists FILES under the dir — stage each batch as a
    // single flat parquet file (write to a scratch dir, move the part).
    def eventsFile(name: String, rows: Seq[(Long, Double)]): Unit = {
      val tmp = s"$root/scratch-$name"
      rows.toDF("user_id", "value")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(1000000)"))
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/$name.parquet"))
    }

    // batch 1: user 1 spends 120.00 at threshold 50.00 -> alerts 1, 2
    eventsFile("f1", Seq((1L, 70.0), (1L, 50.0)))
    StreamOps.thresholdAlertsToDir(spark, streamDir, outDir, ckpt,
      thresholdCents = 5000L)
    val first = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("alert_idx"))).toSet
    first shouldBe Set((1L, 1L), (1L, 2L))

    // batch 2 after restart: +80.00 -> total 200.00 -> alerts 3, 4 ONLY
    eventsFile("f2", Seq((1L, 80.0)))
    StreamOps.thresholdAlertsToDir(spark, streamDir, outDir, ckpt,
      thresholdCents = 5000L)
    val all = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("alert_idx"))).toSet
    all shouldBe Set((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))
  }
}
