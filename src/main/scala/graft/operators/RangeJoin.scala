package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins, bucketized — inequality joins (`point BETWEEN start AND
  * end`, interval overlap) without the cross product Spark's own planner
  * would fall back to (BroadcastNestedLoopJoin over the FULL sides) for a
  * pure inequality condition.
  *
  * Plan: quantize the axis into `bucketWidth`-sized buckets; each point
  * lands in one bucket, each interval EXPLODES onto every bucket it
  * overlaps; equi-join on the bucket id, then apply the exact residual
  * predicate. Each qualifying pair surfaces exactly once — in the point's
  * bucket (point-in-interval) or in the canonical first-overlap bucket
  * (interval overlap) — so no distinct pass is needed.
  *
  * Bucket ids use exact integer arithmetic (`(v - pmod(v, w)) div w` —
  * floor division valid over the FULL long range, negatives included).
  * A double-based `floor(v / w)` loses precision past 2^53 and can bucket
  * a point inconsistently with its interval, silently dropping matches.
  *
  * Explosion cap: one open-ended or data-error interval spanning millions
  * of buckets would otherwise explode into millions of exploded rows on
  * the shuffle. Intervals wider than `maxBucketsPerInterval` buckets are
  * routed through a broadcast residual join instead — they are FEW by
  * definition at a sane `bucketWidth` (size it near the p95 interval
  * length so typical intervals copy 1-2×), so broadcasting them costs
  * almost nothing while the exchange stays bounded no matter what the
  * data contains.
  *
  * Scale: the only shuffle is the bucket equi-join — fully partitionable,
  * AQE-skew-splittable; the oversized-interval side is a broadcast, never
  * a shuffle. Degenerate intervals (end < start) are dropped, matching
  * BETWEEN semantics. Columns pass through from both sides — callers keep
  * them disjoint.
  */
object RangeJoin {

  /** Exact floor(v / w) for long-typed SQL expression `e` (column name or
    * expression text): subtract the non-negative pmod remainder, then
    * integer-divide — every step stays in long arithmetic, so buckets are
    * exact over the full long range (a double-based floor breaks past
    * 2^53). Sole edge: v within bucketWidth of Long.MinValue would wrap in
    * the subtraction — unreachable for real axes (timestamps, offsets).
    */
  private def bucketOf(e: String, w: Long): Column =
    expr(s"(($e) - pmod(($e), ${w}L)) div ${w}L")

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 256): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "rangeJoin: maxBucketsPerInterval must be positive")
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bs", bucketOf(s"`$startCol`", bucketWidth))
      .withColumn("__be", bucketOf(s"`$endCol`", bucketWidth))
    val width = col("__be") - col("__bs") + 1
    val residual = col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)

    val p = points.withColumn("__bk", bucketOf(s"`$pointCol`", bucketWidth))
    val bucketed = iv.filter(width <= maxBucketsPerInterval)
      .withColumn("__bk", explode(sequence(col("__bs"), col("__be"))))
      .drop("__bs", "__be")
      .join(p, Seq("__bk"))
      .filter(residual)
      .drop("__bk")

    // Oversized intervals: broadcast them (few by construction) and apply
    // the exact predicate directly — a BroadcastNestedLoopJoin whose
    // broadcast side is only the outliers, not the whole interval table.
    val oversized = broadcast(iv.filter(width > maxBucketsPerInterval)
      .drop("__bs", "__be"))
    bucketed.unionByName(oversized.join(points, residual)
      .select(bucketed.columns.toIndexedSeq.map(col): _*))
  }

  /** Interval × interval overlap join: pairs where
    * `[lStart,lEnd]` and `[rStart,rEnd]` intersect (inclusive). Both sides
    * explode onto their bucket ranges and equi-join on the bucket id; a
    * pair is emitted only from its CANONICAL bucket — the bucket of
    * `greatest(lStart, rStart)`, the first bucket both intervals occupy —
    * so each overlapping pair surfaces exactly once without a distinct.
    * Oversized intervals on either side take the broadcast residual path
    * (left outliers against all of right, right outliers against the
    * non-outlier left — each pair still counted exactly once).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 256): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "rangeJoin: maxBucketsPerInterval must be positive")
    def prep(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) >= col(s))
      .withColumn("__bs", bucketOf(s"`$s`", bucketWidth))
      .withColumn("__be", bucketOf(s"`$e`", bucketWidth))
    val width = col("__be") - col("__bs") + 1
    val overlap = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)

    val l = prep(left, lStart, lEnd)
    val r = prep(right, rStart, rEnd)
    val lSmall = l.filter(width <= maxBucketsPerInterval)
    val rSmall = r.filter(width <= maxBucketsPerInterval)

    def exploded(df: DataFrame) = df
      .withColumn("__bk", explode(sequence(col("__bs"), col("__be"))))
      .drop("__bs", "__be")
    val bucketed = exploded(lSmall).join(exploded(rSmall), Seq("__bk"))
      .filter(overlap)
      .filter(col("__bk") ===
        bucketOf(s"greatest(`$lStart`, `$rStart`)", bucketWidth))
      .drop("__bk")

    val lBig = broadcast(l.filter(width > maxBucketsPerInterval).drop("__bs", "__be"))
    val rBig = broadcast(r.filter(width > maxBucketsPerInterval).drop("__bs", "__be"))
    val outCols = bucketed.columns.toIndexedSeq.map(col)
    bucketed
      .unionByName(lBig.join(right.filter(col(rEnd) >= col(rStart)), overlap)
        .select(outCols: _*))
      .unionByName(rBig.join(lSmall.drop("__bs", "__be"), overlap)
        .select(outCols: _*))
  }
}
