package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketized — `point BETWEEN start AND end`
  * without the cross product Spark's own planner would fall back to
  * (BroadcastNestedLoopJoin) for a pure inequality join.
  *
  * Plan: quantize the axis into `bucketWidth`-sized buckets; each point
  * lands in one bucket, each interval EXPLODES onto every bucket it
  * overlaps; equi-join on the bucket id, then apply the exact BETWEEN
  * residual. A (interval, point) match surfaces exactly once — in the
  * point's bucket — so no distinct pass is needed.
  *
  * Scale: the only shuffle is the bucket equi-join — fully partitionable,
  * AQE-skew-splittable. Interval explosion is bounded by
  * ceil(len/bucketWidth)+1 rows per interval: size `bucketWidth` near the
  * p95 interval length so typical intervals copy 1-2×. Degenerate
  * inputs (end < start) are dropped, matching BETWEEN semantics.
  *
  * Columns pass through from both sides — callers keep them disjoint.
  */
object RangeJoin {
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be positive")
    val p = points.withColumn("__bk",
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bk", explode(sequence(
        floor(col(startCol).cast("double") / bucketWidth).cast("long"),
        floor(col(endCol).cast("double") / bucketWidth).cast("long"))))
    i.join(p, Seq("__bk"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bk")
  }
}
