package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the nearest right row at or
  * before (`backward`) / at or after (`forward`) its timestamp within the
  * same key. The time-series join Spark has no built-in operator for
  * (pandas merge_asof directions backward/forward, DuckDB ASOF JOIN,
  * kdb aj).
  *
  * Spark-first plan — the UNION trick, not a join: tag both sides, union,
  * and run `last(matched_row_struct, ignoreNulls) OVER (PARTITION BY key
  * ORDER BY ts [DESC for forward], is_left ROWS UNBOUNDED PRECEDING)`.
  * Right rows sort before left rows at equal ts, so each left row sees
  * exactly the nearest right row on its side of the inequality
  * (inclusive).
  *
  * Matched-row atomicity: the right timestamp AND every value column ride
  * in ONE struct, and `last(..., ignoreNulls)` skips only all-null structs
  * (untouched left rows) — never a matched row whose value happens to be
  * NULL. All `asof_*` output fields therefore come from the SAME right
  * row, nulls included, exactly like pandas merge_asof / kdb aj. (Taking
  * `last` per value column independently would stitch an older row's
  * non-null value under a newer row's timestamp.)
  *
  * Scale: ONE shuffle+sort on (key, ts) over |L|+|R| rows — no join state,
  * no per-row probing, no candidate blowup. The naive alternative
  * (theta-join on key + ts<=ts, then max per left row) shuffles the same
  * data but materializes |L|×|matching R| intermediate rows; a window over
  * the union never exceeds |L|+|R|. Skewed keys behave like any window
  * partition (salt upstream if one key dominates).
  *
  * Contract: `right` must be unique per (key, ts) — two right rows at the
  * same instant have no deterministic winner. ENFORCED by default
  * (`validateUnique`): a per-(key, ts) window count on the right leg weaves
  * `raise_error` into the right rows' side tag, Merge.upsertByKey-style —
  * lazy (no extra driver job; the error surfaces when the joined result is
  * first computed, and because the tag feeds the union filter it fires
  * even for consumers that never read the asof_* columns; still
  * best-effort under partial consumption — a limit() that stops before
  * the offending partition won't see it, like the Merge guard) at the
  * cost of one extra window shuffle of the right side. Pass
  * `validateUnique = false` for pre-aggregated inputs to keep the
  * single-shuffle plan.
  *
  * Left columns pass through unchanged; right `valueCols` arrive as
  * `asof_<name>` plus `asof_ts` (the matched right timestamp; all null
  * when no right row qualifies). Unmatched left rows are KEPT (left-join
  * semantics); filter `asof_ts IS NOT NULL` for inner.
  */
object AsOfJoin {

  /** Nearest right row with `right.ts <= left.ts` (most recent
    * at-or-before). `tolerance` bounds the allowed staleness (pandas
    * merge_asof `tolerance`): a match older than `left.ts - tolerance`
    * is nulled out — pass an interval for timestamp axes
    * (`expr("INTERVAL 1 HOUR")`) or a numeric literal for numeric axes.
    * Applied as a post-window projection — the plan is unchanged.
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      validateUnique: Boolean = true,
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCol, tsCol, valueCols, forward = false,
      validateUnique, tolerance)

  /** Nearest right row with `right.ts >= left.ts` (earliest at-or-after);
    * `tolerance` bounds how far ahead a match may be.
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      validateUnique: Boolean = true,
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCol, tsCol, valueCols, forward = true,
      validateUnique, tolerance)

  private def asof(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], forward: Boolean,
      validateUnique: Boolean, tolerance: Option[Column]): DataFrame = {
    require(valueCols.nonEmpty, "asOf: valueCols must be non-empty")
    require(!valueCols.contains("__t"),
      "asOf: the value column name __t is reserved for the matched-row struct")
    val leftCols = left.columns.toSeq
    val outNames = "asof_ts" +: valueCols.map(v => s"asof_$v")
    val clash = leftCols.toSet & outNames.toSet
    require(clash.isEmpty,
      s"asOf: left columns [${clash.mkString(", ")}] collide with the asof_* " +
        "output columns; rename them on the left side first")

    // The uniqueness guard rides in the right leg's __is_left tag (NOT the
    // matched struct): the union filter must evaluate __is_left for every
    // right row no matter which outputs survive column pruning, so the
    // error cannot be optimized away by a consumer that never reads the
    // asof_* columns (e.g. a bare count()).
    val rIsLeft: Column =
      if (!validateUnique) lit(false)
      else when(
        count(lit(1)).over(Window.partitionBy(keyCol, tsCol)) > 1,
        expr("raise_error(concat('asof: right has multiple rows for (key, ts)=(', " +
          s"coalesce(cast(`$keyCol` as string), 'NULL'), ', ', " +
          s"coalesce(cast(`$tsCol` as string), 'NULL'), " +
          "'); pre-aggregate right or pass validateUnique = false'))"))
        .otherwise(lit(false))

    // The matched-row struct: ts + every value column from ONE right row.
    val rStruct = struct(
      (col(tsCol).as("__t") +: valueCols.map(v => col(v).as(v))): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType

    val lTagged = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(true).as("__is_left"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), rIsLeft.as("__is_left"),
      lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
      rStruct.as("__r"))

    // Backward scans time forward (ts asc); forward scans time backward
    // (ts desc). Either way right rows sort before left at equal ts, so
    // the inequality is inclusive.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy("__k")
      .orderBy(tsOrder, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Tolerance nulls the whole matched struct at once (fields stay
    // atomic — either the complete row qualifies or none of it does).
    val matched = tolerance match {
      case None => col("__m")
      case Some(tol) if forward =>
        when(col("__m").getField("__t") <= col("__ts") + tol, col("__m"))
      case Some(tol) =>
        when(col("__m").getField("__t") >= col("__ts") - tol, col("__m"))
    }

    lTagged.unionByName(rTagged)
      .select(col("__is_left"), col("__ts"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__is_left"))
      .withColumn("__m", matched)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        (col("__m").getField("__t").as("asof_ts") +:
          valueCols.map(v => col("__m").getField(v).as(s"asof_$v"))): _*)
  }
}
