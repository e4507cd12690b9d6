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
}
