package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.VectorIndex
import graft.streaming.StreamOps

/** Replay and restart semantics for the streaming IVF drains (x167/
  * x168, `StreamOps.vectorAbsorbDrain` / `vectorRetractDrain`): the
  * vector index must stay exactly-once when the drain resumes
  * mid-stream from its checkpoint, when a COMPLETED micro-batch
  * replays (the stored-ids anti-join skips it), and when a retraction
  * micro-batch replays (tombstone appends are idempotent). The final
  * index must be indistinguishable from its batch-built twin.
  */
class StreamVectorRestartSpec extends SparkSpec with Matchers {

  private def vecs(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
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

  test("vector drain resumes from its checkpoint; completed-batch replay is a no-op; final index equals the batch twin") {
    val base = vecs(1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f),
      3L -> Array(0.9f, 0.1f), 4L -> Array(0.1f, 0.9f))
    val f1 = vecs(5L -> Array(0.8f, 0.2f), 6L -> Array(0.2f, 0.8f))
    val f2 = vecs(7L -> Array(0.7f, 0.3f), 8L -> Array(0.6f, 0.4f))
    val root = java.nio.file.Files.createTempDirectory("graft-svec").toString
    val streamDir = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
    VectorIndex.buildIvfIndex(base, "vec_id", "embedding", s"$root/idx",
      nlist = 2)
    def drain(): Unit = StreamOps.vectorAbsorbDrain(spark, streamDir,
      s"$root/ckpt", s"$root/idx", "vec_id", "embedding")
    def storedIds(): Seq[Long] = spark.read.parquet(s"$root/idx/vectors")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq

    // run 1: only f1 exists
    stage(streamDir, "f1", f1)
    drain()
    storedIds() shouldBe Seq(1L, 2L, 3L, 4L, 5L, 6L)

    // run 2 after restart: the checkpoint resumes past f1 (its vectors
    // are NOT double-absorbed) and absorbs only f2
    stage(streamDir, "f2", f2)
    drain()
    storedIds() shouldBe Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)

    // replay of a COMPLETED batch (crash after absorb, before the
    // checkpoint commit): the foreachBatch body re-runs on f2's rows —
    // the stored-ids anti-join makes it a no-op
    StreamOps.absorbVectorBatch(f2, s"$root/idx", "vec_id", "embedding")
    storedIds() shouldBe Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    spark.read.parquet(s"$root/idx/vectors").groupBy("vec_id").count()
      .agg(max("count")).head().getLong(0) shouldBe 1L

    // the streamed index IS the batch-built twin: same base build, one
    // batch absorb of f1 ∪ f2, identical probe answers
    VectorIndex.buildIvfIndex(base, "vec_id", "embedding", s"$root/twin",
      nlist = 2)
    VectorIndex.absorbIntoIvfIndex(f1.unionByName(f2), "vec_id",
      "embedding", s"$root/twin")
    val q = vecs(1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f))
    def probe(path: String) = VectorIndex.probeIvfIndex(q, path,
        "vec_id", "embedding", k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    probe(s"$root/idx") shouldBe probe(s"$root/twin")
  }

  test("retract drain: checkpoint resume, idempotent replay, mid-stream compaction") {
    val corpus = vecs(1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f),
      3L -> Array(0.9f, 0.1f), 4L -> Array(0.1f, 0.9f),
      5L -> Array(0.8f, 0.2f), 6L -> Array(0.2f, 0.8f))
    val root = java.nio.file.Files.createTempDirectory("graft-svecr").toString
    val streamDir = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
    VectorIndex.buildIvfIndex(corpus, "vec_id", "embedding", s"$root/idx",
      nlist = 2)
    import spark.implicits._
    def drain(): Unit = StreamOps.vectorRetractDrain(spark, streamDir,
      s"$root/ckpt", s"$root/idx", "vec_id")
    def searchable(): Seq[Long] =
      graft.operators.ArtifactStore.readStore(spark, s"$root/idx",
          "vectors", "vec_id")
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq

    stage(streamDir, "f1", Seq(3L).toDF("vec_id"))
    drain()
    searchable() shouldBe Seq(1L, 2L, 4L, 5L, 6L)

    // fold the tombstone physically, then a later takedown file lands
    VectorIndex.compactIvfIndex(spark, s"$root/idx")
    graft.operators.ArtifactStore.hasTombstones(spark, s"$root/idx") shouldBe false
    stage(streamDir, "f2", Seq(5L).toDF("vec_id"))
    drain()
    searchable() shouldBe Seq(1L, 2L, 4L, 6L)

    // replayed retraction micro-batch: idempotent by construction
    VectorIndex.retractFromIvfIndex(Seq(5L).toDF("vec_id"), "vec_id",
      s"$root/idx")
    spark.read.parquet(s"$root/idx/tombstones").count() shouldBe 1L
    searchable() shouldBe Seq(1L, 2L, 4L, 6L)

    // a takedown for a NEVER-INDEXED id is not tombstoned (the round-11
    // labels advisory applied to vectors): the id stays free for a
    // genuinely new vector without a compact
    VectorIndex.retractFromIvfIndex(Seq(999L).toDF("vec_id"), "vec_id",
      s"$root/idx")
    spark.read.parquet(s"$root/idx/tombstones").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(5L)
    VectorIndex.absorbIntoIvfIndex(
      vecs(999L -> Array(0.5f, 0.5f)), "vec_id", "embedding", s"$root/idx")
    searchable() shouldBe Seq(1L, 2L, 4L, 6L, 999L)
  }
}
