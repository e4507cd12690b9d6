package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Shared store discipline for the persisted-artifact families — the
  * LSH label/index family (`Dedup`) and the IVF vector index
  * (`VectorIndex`). Every rule here was earned on the LSH family and
  * holds for any write-once/maintain-forever artifact:
  *
  *  - paths go through the Hadoop FileSystem API, never `java.io.File`
  *    (an hdfs:///s3:// store must behave exactly like a local one);
  *  - a write that REPLACES a store is a staged swap
  *    (`writeParquetStaged`) — plain overwrite deletes the target
  *    before the job runs, so a mid-job crash loses the store;
  *  - deletions are TOMBSTONES every reader anti-joins (`readStore`) —
  *    flat-cost retraction, with `compact` as the periodic physical
  *    fold;
  *  - appends are idempotent (`appendMissing`) — a retry after a
  *    partial failure skips the rows a previous run committed;
  *  - the single-row build-parameter `meta` store is read at most once
  *    per (JVM, qualified path) (`cachedMeta`; builds seed the cache) —
  *    a per-batch driver job here is exactly the per-batch overhead a
  *    many-small-batches maintenance loop must not pay.
  */
private[operators] object ArtifactStore {

  /** Count of actual meta-store read JOBS, for specs pinning "at most
    * one per (JVM, path)". */
  val metaReads = new java.util.concurrent.atomic.AtomicLong(0)

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Row]]()

  def qualifiedPath(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toString
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    ()
  }

  def invalidateMeta(spark: SparkSession, root: String): Unit = {
    metaCache.remove(qualifiedPath(spark, root)); ()
  }

  /** Seed the cache with the meta row a build just wrote — its first
    * consumer then skips the read job entirely. */
  def seedMeta(spark: SparkSession, root: String, row: Row): Unit = {
    metaCache.put(qualifiedPath(spark, root), Some(row)); ()
  }

  /** The artifact's single-row `meta` store, read once per (JVM,
    * qualified path); `None` caches "this root predates the meta
    * store". Roots mutated outside the artifact APIs (a raw file copy
    * over an existing root) are on the caller — `invalidateMeta` is the
    * escape hatch.
    */
  def cachedMeta(spark: SparkSession, root: String): Option[Row] =
    metaCache.computeIfAbsent(qualifiedPath(spark, root),
      _ => if (!exists(spark, s"$root/meta")) None
      else {
        metaReads.incrementAndGet()
        Some(spark.read.parquet(s"$root/meta").head())
      })

  /** Swap-style parquet rewrite: the new data lands complete at
    * `<path>.__staging` first, then two renames swap it in (old store
    * parked at `<path>.__old` until the swap commits). At every instant
    * a COMPLETE store exists under some path; the one crash window
    * between the renames leaves the previous store intact at
    * `<path>.__old` — recovery is renaming it back. Stale staging/old
    * dirs from a crashed run are cleared on entry.
    */
  def writeParquetStaged(spark: SparkSession, df: DataFrame,
      path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(path + ".__staging")
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    fs.delete(staging, true)
    fs.delete(old, true)
    df.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(target)) require(fs.rename(target, old),
      s"writeParquetStaged: could not park $target at $old")
    require(fs.rename(staging, target),
      s"writeParquetStaged: could not swap $staging into $target " +
        s"(previous store intact at $old)")
    fs.delete(old, true)
    ()
  }

  /** Tombstone-filtered read of one of the root's row stores: retracted
    * keys are invisible to every consumer (the deletion-vector
    * pattern). Tombstone sets are takedown-sized — broadcast. */
  def readStore(spark: SparkSession, root: String, sub: String,
      keyCol: String): DataFrame = {
    val df = spark.read.parquet(s"$root/$sub")
    if (exists(spark, s"$root/tombstones"))
      df.join(broadcast(spark.read.parquet(s"$root/tombstones")
        .select(keyCol)), Seq(keyCol), "left_anti")
    else df
  }

  def hasTombstones(spark: SparkSession, root: String): Boolean =
    exists(spark, s"$root/tombstones")

  def tombstoneKeys(spark: SparkSession, root: String,
      keyCol: String): DataFrame =
    spark.read.parquet(s"$root/tombstones").select(keyCol)

  /** Idempotent append to one row store: rows whose key the store
    * already holds are dropped first (keys-side scan with the batch
    * broadcast into it, the tiny present set broadcast back — never a
    * corpus shuffle; the checkpoint materializes the scan BEFORE the
    * append mutates the directory it scanned). A retry after a partial
    * failure therefore never duplicates rows.
    */
  def appendMissing(spark: SparkSession, root: String, sub: String,
      keyCol: String, batchKeys: DataFrame, rows: DataFrame): Unit = {
    val present = spark.read.parquet(s"$root/$sub").select(keyCol)
      .join(broadcast(batchKeys), Seq(keyCol), "left_semi")
      .distinct().localCheckpoint()
    rows.join(broadcast(present), Seq(keyCol), "left_anti")
      .write.mode("append").parquet(s"$root/$sub")
  }

  /** Idempotent tombstone append (keys already tombstoned are skipped —
    * a replayed retraction appends nothing). */
  def appendTombstones(spark: SparkSession, root: String, keyCol: String,
      keys: DataFrame): Unit = {
    val fresh =
      if (hasTombstones(spark, root))
        keys.join(broadcast(tombstoneKeys(spark, root, keyCol)),
          Seq(keyCol), "left_anti")
      else keys
    fresh.write.mode("append").parquet(s"$root/tombstones")
  }

  /** Fold the tombstone set into `subs` physically — one corpus-sized
    * rewrite amortizing any number of retractions, after which readers
    * stop paying the anti-join and retracted keys may be re-ingested.
    * Idempotent and crash-safe: each store swaps independently (a
    * half-compacted root still filters correctly — the tombstones dir
    * is deleted LAST), and a retry completes whatever a crash left
    * undone.
    */
  def compact(spark: SparkSession, root: String, subs: Seq[String],
      keyCol: String): Unit = {
    if (hasTombstones(spark, root)) {
      subs.foreach { sub =>
        writeParquetStaged(spark, readStore(spark, root, sub, keyCol),
          s"$root/$sub")
      }
      deletePath(spark, s"$root/tombstones")
    }
  }
}
