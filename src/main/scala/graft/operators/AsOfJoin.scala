package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, attach the MOST RECENT right
  * row with `right.ts <= left.ts` (inclusive) within the same key. The
  * time-series join Spark has no built-in operator for (pandas merge_asof,
  * DuckDB ASOF JOIN, kdb aj).
  *
  * Spark-first plan — the UNION trick, not a join: tag both sides, union,
  * and run `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY ts,
  * is_left ROWS UNBOUNDED PRECEDING)`. Right rows sort before left rows at
  * equal ts, so each left row sees exactly the latest right value at or
  * before it.
  *
  * Scale: ONE shuffle+sort on (key, ts) over |L|+|R| rows — no join state,
  * no per-row probing, no candidate blowup. The naive alternative
  * (theta-join on key + ts<=ts, then max per left row) shuffles the same
  * data but materializes |L|×|matching R| intermediate rows; a window over
  * the union never exceeds |L|+|R|. Skewed keys behave like any window
  * partition (salt upstream if one key dominates).
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate
  * otherwise (the operator cannot pick between two right rows at the same
  * instant deterministically). Left columns pass through unchanged; right
  * `valueCols` arrive as `asof_<name>` plus `asof_ts` (the matched right
  * timestamp; all null when no right row precedes). Unmatched left rows
  * are KEPT (left-join semantics); filter `asof_ts IS NOT NULL` for inner.
  */
object AsOfJoin {
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asOf: valueCols must be non-empty")
    val tsType = left.schema(tsCol).dataType
    val leftCols = left.columns.toSeq

    val lTagged = left
      .select(
        Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(true).as("__is_left"),
          struct(leftCols.map(col): _*).as("__l"),
          lit(null).cast(tsType).as("__r_ts")) ++
        valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(s"__r_$v")): _*)
    val rTagged = right
      .select(
        Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(false).as("__is_left"),
          lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
          col(tsCol).as("__r_ts")) ++
        valueCols.map(v => col(v).as(s"__r_$v")): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .select(
        Seq(col("__is_left"), col("__l"),
          last(col("__r_ts"), ignoreNulls = true).over(w).as("asof_ts")) ++
        valueCols.map(v =>
          last(col(s"__r_$v"), ignoreNulls = true).over(w).as(s"asof_$v")): _*)
      .filter(col("__is_left"))
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        (col("asof_ts") +: valueCols.map(v => col(s"asof_$v"))): _*)
  }
}
