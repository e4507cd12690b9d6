package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the "what is in this table" first pass every data
  * pipeline runs before curation decisions: per column, non-null / null /
  * exact-distinct counts and min/max rendered as strings. One job, one
  * result row per profiled column.
  *
  * Plan shape: a single global aggregate computes every column's stats in
  * one pass over the data, then a map-only `stack` unpivots the one-row
  * result into (column, stats) rows. The exact `count(DISTINCT c)` per
  * column makes Catalyst plan an Expand (input × #cols) feeding partial
  * aggregates — the standard exact multi-distinct shape: map-side partial
  * aggregation collapses each partition to its distinct values before the
  * shuffle, so the exchange carries at most Σ per-column cardinalities,
  * not #cols × rows. At 100 TB profile in two tiers: this exact pass for
  * the columns that need exact cardinality, `approx_count_distinct` (see
  * x23) for the rest — same operator, swap the agg.
  *
  * min/max arrive as strings via CAST; keep profiled columns to types with
  * engine-portable rendering (integers, strings, booleans, dates) — float
  * formatting differs across engines (profile floats via an integer
  * transform first).
  */
object Profile {

  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: unknown columns ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __total - __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column_name, non_null_count, null_count, distinct_count, min_value, max_value)")
  }
}
