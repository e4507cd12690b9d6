package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for write-time
  * file layout. At 100 TB the scan you avoid is the cheapest scan: laying
  * files out along a Z-order (Morton) curve over the two most-filtered
  * dimensions lets parquet min/max (and Delta file-skipping) prune on BOTH
  * dimensions from one sort key — the OPTIMIZE ZORDER BY idea, expressed
  * as plain bit arithmetic + repartitionByRange so it works on any sink.
  */
object Layout {

  /** 2-D Morton interleave: bit i of `a` lands at output bit 2i+1 and bit
    * i of `b` at 2i, for the low `bits` bits of each (callers bucket each
    * dimension into [0, 2^bits) first — range-bucket, hash, or epoch-day).
    * Pure codegen'd integer arithmetic, exact and engine-portable: the
    * DuckDB twin is the same shift/AND/OR chain.
    */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "mortonKey: bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Consistent-hash ring assignment: each of `shards` shards projects
    * `vnodes` virtual points onto a 56-bit ring (hash of
    * "ring_<shard>_<vnode>"); a key lands on the first point at or after
    * its own hash (wrapping). The property that matters at 100 TB: when
    * the shard count changes, only the keys between affected ring points
    * move (~1/newShards of the corpus), where mod-hashing reshuffles
    * almost everything — rebalancing cost is the operator
    * `shardMovement` quantifies. Pure broadcast + map-side aggregate:
    * the ring is shards×vnodes rows, keys never shuffle to be assigned.
    */
  def ringAssign(df: DataFrame, keyCol: String, shards: Int,
      vnodes: Int = 16): DataFrame = {
    require(shards >= 1 && vnodes >= 1, "ringAssign: shards/vnodes must be >= 1")
    require(!df.columns.contains("shard"),
      "ringAssign: input already has a shard column — rename it upstream")
    val pts = for { s <- 0 until shards; v <- 0 until vnodes }
      yield (graft.functions.Portable.hash56Local(s"ring_${s}_$v"), s)
    val ring = array(pts.sortBy(identity).map { case (ph, s) =>
      struct(lit(ph).as("ph"), lit(s).as("s")) }: _*)
    // MAP-ONLY: the sorted ring is a literal inside the plan; the first
    // point at-or-after the key's hash is the first survivor of the
    // filter HOF (try_element_at stays null-safe under ANSI when the key
    // hashes past the last point and wraps to ring[1]).
    df.withColumn("__kh",
        graft.functions.Portable.hash56(col(keyCol).cast("string")))
      .withColumn("__ring", ring)
      .withColumn("shard", coalesce(
        expr("try_element_at(filter(__ring, p -> p.ph >= __kh), 1).s"),
        expr("try_element_at(__ring, 1).s")))
      .drop("__kh", "__ring")
  }

  /** Resharding movement report: assign keys under `fromShards` and
    * `toShards` with BOTH schemes — the consistent ring and plain
    * mod-hashing — and count how many keys change shards. One row:
    * (total, ring_moved, ring_pct_x10000, mod_moved, mod_pct_x10000).
    * The ring's movement approaches the theoretical
    * |to−from|/max(to,from); mod reshuffles nearly everything — the
    * number that decides whether a topology change is an online
    * rebalance or a full rewrite.
    */
  def shardMovement(df: DataFrame, keyCol: String, fromShards: Int,
      toShards: Int, vnodes: Int = 16): DataFrame = {
    require(fromShards >= 1 && toShards >= 1,
      "shardMovement: shard counts must be >= 1")
    val keys = df.select(col(keyCol).as("k")).distinct()
    val a = ringAssign(keys, "k", fromShards, vnodes)
      .select(col("k"), col("shard").as("ring_from"))
    val b = ringAssign(keys, "k", toShards, vnodes)
      .select(col("k"), col("shard").as("ring_to"))
    a.join(b, Seq("k"))
      .withColumn("__kh", graft.functions.Portable.hash56(col("k").cast("string")))
      .agg(count(lit(1)).as("total"),
        sum(when(col("ring_from") =!= col("ring_to"), 1L).otherwise(0L))
          .as("ring_moved"),
        sum(when(col("__kh") % fromShards =!= col("__kh") % toShards, 1L)
          .otherwise(0L)).as("mod_moved"))
      .select(col("total"), col("ring_moved"),
        expr("div(10000 * ring_moved, greatest(total, 1))").as("ring_pct_x10000"),
        col("mod_moved"),
        expr("div(10000 * mod_moved, greatest(total, 1))").as("mod_pct_x10000"))
  }

  /** Cluster `df` along the Z-curve of two pre-bucketed dimensions: adds
    * `zkey` = mortonKey(aBucket, bBucket) and range-partitions + sorts by
    * it, so each output file covers one compact Z-curve segment — a
    * rectangle-ish region in (a, b) space — and carries tight min/max on
    * BOTH source columns. `numPartitions` sizes output files
    * (≈ rows/partition); range boundaries come from Spark's sampling, the
    * standard write-layout shape.
    */
  def clusterByZ(df: DataFrame, aBucket: Column, bBucket: Column,
      bits: Int = 16, numPartitions: Int = 32): DataFrame = {
    require(!df.columns.contains("zkey"),
      "clusterByZ: input already has a zkey column — rename it upstream")
    df.withColumn("zkey", mortonKey(aBucket, bBucket, bits))
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  /** Small-file compaction planner — the maintenance pass every
    * long-running ingest needs (streaming sinks and per-batch appends
    * leave thousands of KB-sized files; at 100 TB the NameNode/listing
    * and per-file open overheads dominate scans long before the bytes
    * do). Given a file listing (partition, file, bytes), assign each
    * file to a rewrite group targeting `targetBytes` per output file.
    *
    * Assignment is STRIPE-based and fully deterministic: within each
    * partition, files are taken in `fileCol` order and group k receives
    * the files whose exclusive cumulative-byte prefix falls in
    * [k·target, (k+1)·target). Properties: at most
    * ceil(partitionBytes/target)+1 groups per partition; every group
    * except the last holds ≥ target − (largest file − 1) bytes; a file
    * larger than target occupies its own stripe span but is never split
    * (compaction rewrites whole files). This is the same plan a
    * sequential greedy packer produces whenever files are small relative
    * to target — and unlike the greedy recurrence it is ONE window
    * cumulative sum, no driver loop, planning 10^8 file entries as a
    * single shuffle by partition dir.
    *
    * Output: one row per file — (part, file, bytes, group_id) — the
    * rewrite manifest a compactor executes per (part, group_id).
    */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, "compactionPlan: targetBytes must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("file")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files.select(col(partCol).as("part"), col(fileCol).as("file"),
        col(bytesCol).cast("long").as("bytes"))
      .withColumn("__pre", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("group_id", expr(s"div(__pre, ${targetBytes}L)"))
      .drop("__pre")
  }
}
