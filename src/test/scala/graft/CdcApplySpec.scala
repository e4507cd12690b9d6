package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** CDC apply restart safety (ADVICE round-5 item): a replayed micro-batch
  * (crash between the v<batchId> write and the checkpoint commit) must merge
  * against versions strictly below its own batchId, and partially-written
  * version dirs (no _SUCCESS) must never count as the latest snapshot.
  */
class CdcApplySpec extends SparkSpec with Matchers {
  import StreamOps.{applyCdcBatch, latestSnapshot}

  private def changes(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v", "seq")
  }

  private def snapshotMap(root: String): Map[Long, String] =
    latestSnapshot(spark, root).get
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("dedup ingest: first batch owns a fingerprint; replay is idempotent") {
    import spark.implicits._
    import StreamOps.ingestDedupBatch
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft-sdi-fold").toString
    // batch 0: A duplicated in-batch (keeper = min id 10), B novel
    ingestDedupBatch(docs(10L -> "A", 11L -> "A", 12L -> "B"), 0, root, "doc_id", "text")
    // batch 1: doc 1 re-sends A — the INDEXED keeper (10) must win even
    // though 1 < 10; C is novel
    ingestDedupBatch(docs(1L -> "A", 2L -> "C"), 1, root, "doc_id", "text")
    def keepers = latestSnapshot(spark, root).get
      .select("keeper_id").collect().map(_.getLong(0)).toSet
    keepers shouldBe Set(10L, 12L, 2L)
    // crash replay of batch 1 (same batchId): identical snapshot
    ingestDedupBatch(docs(1L -> "A", 2L -> "C"), 1, root, "doc_id", "text")
    keepers shouldBe Set(10L, 12L, 2L)
    latestSnapshot(spark, root).get.count() shouldBe 3
  }

  test("pruneSnapshots keeps the newest k committed versions, spares in-flight dirs") {
    import StreamOps.{applyCdcBatch, pruneSnapshots}
    val root = Files.createTempDirectory("graft-cdc-prune").toString
    (0 to 3).foreach { b =>
      applyCdcBatch(changes(Seq((1L, s"a$b", b.toLong))), b, root, "k", Seq("seq"))
    }
    // an in-flight (uncommitted) newer dir must survive the vacuum
    val inflight = new java.io.File(root, "v9"); inflight.mkdirs()
    pruneSnapshots(root, keepLast = 2) shouldBe Seq(0L, 1L)
    new java.io.File(root, "v2").exists() shouldBe true
    new java.io.File(root, "v3").exists() shouldBe true
    inflight.exists() shouldBe true
    snapshotMap(root) shouldBe Map(1L -> "a3") // latest committed unchanged
  }

  test("cdc batches fold last-writer-wins per key across versions") {
    val root = Files.createTempDirectory("graft-cdc-fold").toString
    applyCdcBatch(changes(Seq((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b0", 1L))),
      batchId = 0, root, "k", Seq("seq"))
    applyCdcBatch(changes(Seq((2L, "b1", 2L), (3L, "c0", 1L))),
      batchId = 1, root, "k", Seq("seq"))
    snapshotMap(root) shouldBe Map(1L -> "a1", 2L -> "b1", 3L -> "c0")
  }

  test("replaying a batch after a crash-before-commit reproduces the same snapshot") {
    val root = Files.createTempDirectory("graft-cdc-replay").toString
    applyCdcBatch(changes(Seq((1L, "a0", 1L), (2L, "b0", 1L))),
      batchId = 0, root, "k", Seq("seq"))
    val batch1 = Seq((1L, "a1", 2L), (3L, "c0", 1L))
    applyCdcBatch(changes(batch1), batchId = 1, root, "k", Seq("seq"))
    val once = snapshotMap(root)
    // Crash landed between the v1 write and the checkpoint commit: the
    // stream replays batch 1. The merge base must be v0 (strictly below
    // batchId 1), never the v1 dir the replay is about to overwrite.
    applyCdcBatch(changes(batch1), batchId = 1, root, "k", Seq("seq"))
    snapshotMap(root) shouldBe once
    snapshotMap(root) shouldBe Map(1L -> "a1", 2L -> "b0", 3L -> "c0")
  }

  test("a version dir without _SUCCESS is invisible to latestSnapshot") {
    val root = Files.createTempDirectory("graft-cdc-partial").toString
    applyCdcBatch(changes(Seq((1L, "a0", 1L))), batchId = 0, root, "k", Seq("seq"))
    // Simulate a crashed mid-write v1: parquet part files but no _SUCCESS.
    changes(Seq((1L, "poison", 9L))).write.parquet(s"$root/v1")
    assert(new java.io.File(s"$root/v1/_SUCCESS").delete())
    snapshotMap(root) shouldBe Map(1L -> "a0")
    // maxExclusive hides a committed own-version dir too (the replay path).
    latestSnapshot(spark, root, maxExclusive = Some(0L)) shouldBe None
  }

  test("cdcApply end-to-end: crash between v-dir write and checkpoint commit replays idempotently") {
    // The ADVICE round-6 scenario, driven through the REAL stream restart
    // machinery (not applyCdcBatch directly): batch 1's v1 directory lands
    // but the checkpoint commit does not — on restart Structured Streaming
    // re-executes batchId 1, and the strictly-below-batchId merge base
    // must reproduce the identical snapshot instead of folding v1 into
    // itself.
    val root = Files.createTempDirectory("graft-cdc-crash").toString
    val ckpt = Files.createTempDirectory("graft-cdc-crash-ckpt").toString
    // a DIRECTORY source keeps the stream path stable across restarts
    val chgDir = Files.createTempDirectory("graft-cdc-crash-chg").toString
    changes(Seq((1L, "a0", 1L), (2L, "b0", 1L)))
      .coalesce(1).write.mode("append").parquet(chgDir)
    StreamOps.cdcApply(spark, chgDir, root, "k", Seq("seq"),
      queryName = s"cdc_crash0_${System.nanoTime()}", checkpointDir = Some(ckpt))
    snapshotMap(root) shouldBe Map(1L -> "a0", 2L -> "b0")
    changes(Seq((1L, "a1", 2L), (3L, "c0", 1L)))
      .coalesce(1).write.mode("append").parquet(chgDir)
    StreamOps.cdcApply(spark, chgDir, root, "k", Seq("seq"),
      queryName = s"cdc_crash1_${System.nanoTime()}", checkpointDir = Some(ckpt))
    val once = snapshotMap(root)
    once shouldBe Map(1L -> "a1", 2L -> "b0", 3L -> "c0")
    // Kill the commit marker of the newest batch: offsets say batch 1
    // started, commits say it never finished — exactly the crash window.
    val commitFiles = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val maxCommit = commitFiles.map(_.getName.toLong).max
    maxCommit shouldBe 1L
    assert(new java.io.File(s"$ckpt/commits/$maxCommit").delete())
    // the local FS is checksummed: a real crash leaves neither the commit
    // nor its CRC shadow, and a stale CRC fails the replay's rename
    new java.io.File(s"$ckpt/commits/.$maxCommit.crc").delete()
    StreamOps.cdcApply(spark, chgDir, root, "k", Seq("seq"),
      queryName = s"cdc_crash2_${System.nanoTime()}", checkpointDir = Some(ckpt))
    snapshotMap(root) shouldBe once
    // and the replay really did rewrite v1 from the v0 base (no v2 grew)
    new java.io.File(root, "v2").exists() shouldBe false
  }

  test("cdcApply end-to-end with a checkpoint folds the change file once") {
    val root = Files.createTempDirectory("graft-cdc-e2e").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val chg = Files.createTempDirectory("graft-cdc-chg").resolve("changes.parquet")
    changes(Seq((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b0", 1L)))
      .coalesce(1).write.parquet(chg.toString)
    StreamOps.cdcApply(spark, chg.toString, root, "k", Seq("seq"),
      queryName = s"cdc_e2e_${System.nanoTime()}", checkpointDir = Some(ckpt))
    snapshotMap(root) shouldBe Map(1L -> "a1", 2L -> "b0")
  }
}
