package graft

import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** Restart continuity of the streaming Misra–Gries monitor (x138): the
  * per-shard counter maps resume from the checkpoint, so a token that is
  * BELOW the heavy threshold in every individual wave still accumulates
  * across a restart and surfaces once its global share crosses 1/k —
  * while total state stays bounded by shards × (k−1) entries no matter
  * how many distinct filler tokens stream past.
  */
class StreamMgRestartSpec extends SparkSpec with Matchers {

  test("MG state resumes across a restart and keeps the heavy-hitter guarantee") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mg-restart").toString
    val streamDir = s"$root/in"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))

    def wave(tag: String, fillers: Int): org.apache.spark.sql.DataFrame = {
      // 60 "sneaky" occurrences + `fillers` unique one-off tokens
      val sneakyDocs = (0 until 6).map(i =>
        (s"$tag-s$i", Seq.fill(10)("sneaky").mkString(" ")))
      val fillerDocs = (0 until fillers / 10).map(i =>
        (s"$tag-f$i", (0 until 10).map(j => s"${tag}_f${i}_$j").mkString(" ")))
      (sneakyDocs ++ fillerDocs).toDF("doc_id", "text")
    }
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/scratch-$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/$name.parquet")); ()
    }

    val k = 10; val shards = 4
    val w1 = wave("w1", 440); val w2 = wave("w2", 440)
    stage(w1, "f1")
    StreamOps.heavyHittersMgDrain(spark, streamDir, ckpt, s"$root/ticks",
      k, shards)

    // sneaky is 60/500 = 12% > 1/k after wave 1 — present already
    val mid = StreamOps.heavyHittersFromState(spark, ckpt, w1, k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    mid.toSeq shouldBe Seq(("sneaky", 60L))

    // wave 2 lands, a NEW query resumes the same checkpoint
    stage(w2, "f2")
    StreamOps.heavyHittersMgDrain(spark, streamDir, ckpt, s"$root/ticks",
      k, shards)

    val out = StreamOps.heavyHittersFromState(spark, ckpt, w1.union(w2), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 120 of 1000 tokens = 12.00% — the only token above 10%
    out.toSeq shouldBe Seq(("sneaky", 120L, 1200L))

    // bounded state: at most shards × (k−1) counter entries survive the
    // 880 distinct fillers that streamed past
    val stateRows = spark.read.format("statestore")
      .option("stateVarName", "mg").load(ckpt).count()
    stateRows should be <= (shards * (k - 1)).toLong
  }
}
