package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Profile
import graft.streaming.StreamOps

/** Replay and restart semantics for the streaming histogram drain
  * (x185, `StreamOps.histogramAbsorbDrain`): the artifact must stay
  * exactly-once when the drain resumes mid-stream from its checkpoint,
  * when a COMPLETED shard file replays (the shard ledger skips it —
  * even after a compact erased the rows' identity), and the streamed
  * store must answer quantiles bit-identically to its batch-built
  * twin (integer buckets make the pin exact).
  */
class StreamHistogramRestartSpec extends SparkSpec with Matchers {

  private def shardRows(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("shard", "c")
  }

  private def stage(streamDir: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$streamDir-scratch-$name"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$streamDir/$name.parquet"))
    ()
  }

  test("histogram drain resumes from its checkpoint; a replayed shard is ledger-blocked (also post-compact); streamed quantiles equal the batch twin") {
    val base = shardRows(0L -> 100L, 0L -> 1100L, 0L -> 2100L)
    val f1 = shardRows(1L -> 150L, 1L -> 1150L) // shard 1, whole file
    val f2 = shardRows(2L -> 3100L, 2L -> 250L) // shard 2, whole file
    val root = java.nio.file.Files.createTempDirectory("graft-shist")
      .toString
    val streamDir = s"$root/in"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(streamDir))
    Profile.buildHistogramArtifact(base, "shard", col("c"),
      widthCents = 1000L, s"$root/hist")
    def drain(): Unit = StreamOps.histogramAbsorbDrain(spark, streamDir,
      s"$root/ckpt", s"$root/hist", "shard", col("c"))
    def totalCnt(): Long = spark.read.parquet(s"$root/hist/shards")
      .agg(sum("cnt")).head().getLong(0)
    def quantiles(): Seq[(Int, Long, Long)] =
      Profile.quantilesFromHistogramArtifact(spark, s"$root/hist",
          qsX10000 = Seq(5000, 10000))
        .orderBy("q_x10000").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

    // run 1: only f1 exists
    stage(streamDir, "f1", f1)
    drain()
    totalCnt() shouldBe 5L

    // run 2 after restart: the checkpoint resumes past f1 (shard 1 is
    // NOT double-folded) and absorbs only f2
    stage(streamDir, "f2", f2)
    drain()
    totalCnt() shouldBe 7L

    // replay of a COMPLETED shard (crash after absorb, before the
    // checkpoint commit): the foreachBatch body re-runs on f2's rows —
    // the ledger makes it a no-op
    Profile.absorbIntoHistogram(f2, "shard", col("c"), s"$root/hist")
    totalCnt() shouldBe 7L

    // compact erases shard identity from the rows; the LEDGER still
    // blocks a re-delivered shard file
    Profile.compactHistogram(spark, s"$root/hist")
    Profile.absorbIntoHistogram(f1, "shard", col("c"), s"$root/hist")
    totalCnt() shouldBe 7L

    // streamed store answers quantiles bit-identically to the batch twin
    Profile.buildHistogramArtifact(
      base.unionByName(f1).unionByName(f2), "shard", col("c"),
      widthCents = 1000L, s"$root/twin")
    val twin = Profile.quantilesFromHistogramArtifact(spark,
        s"$root/twin", qsX10000 = Seq(5000, 10000))
      .orderBy("q_x10000").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    quantiles() shouldBe twin
  }
}
