package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based upsert (the WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT
  * subset of Delta's MERGE) as a pure batch transformation:
  * result = updates ∪ (base ⟕anti updates on key).
  *
  * Scale: one shuffle of each side on the key (the anti-join); updates is
  * usually the small side and broadcasts under AQE, making the merge a
  * single scan of base. The parquet sink applies the result with an
  * overwrite write — transactional MERGE needs a table format with a
  * commit log (Delta/Iceberg), which this environment doesn't ship;
  * semantics of the produced ROWS are identical.
  */
object Merge {
  /** `validateUniqueKeys` (default true) mirrors Delta MERGE's "multiple
    * source rows matched" error: duplicate update keys would silently emit
    * both rows, breaking the one-row-per-key invariant. The check is LAZY —
    * a per-key window count over `updates` (the small side) feeding a
    * `raise_error` woven into the key projection — so it adds no extra
    * driver-side job; the error surfaces when the merged result is first
    * computed. BEST-EFFORT under partial consumption: a `limit`/`show`
    * that stops before the offending partition, or a downstream filter
    * that prunes the duplicate key's rows, can complete without raising
    * (unlike the eager collect-based check this replaced). Full actions —
    * count, write, the sink path — always evaluate every row and always
    * raise. Callers that need fail-fast-at-call-time semantics under
    * partial consumption should pre-check
    * `updates.groupBy(key).count().filter("count > 1").isEmpty` themselves.
    * Disable to also skip the window shuffle when uniqueness is guaranteed
    * upstream.
    */
  def upsertByKey(base: DataFrame, updates: DataFrame, key: String,
      validateUniqueKeys: Boolean = true): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert requires identical schemas, got ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val upd =
      if (!validateUniqueKeys) updates
      else {
        val guardedKey = when(
          count(lit(1)).over(Window.partitionBy(key)) > 1,
          expr("raise_error(concat('upsert: updates contain multiple rows for key ', " +
            s"coalesce(cast(`$key` as string), 'NULL'), " +
            "'; dedup updates first or pass validateUniqueKeys = false'))"))
          .otherwise(col(key)).as(key)
        updates.select(updates.columns.toSeq
          .map(c => if (c == key) guardedKey else col(c)): _*)
      }
    upd.unionByName(base.join(upd.select(key), Seq(key), "left_anti"))
  }
}
