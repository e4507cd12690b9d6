package graft.operators

import org.apache.spark.sql.DataFrame

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
    * both rows, breaking the one-row-per-key invariant. The check is one
    * extra aggregation job over `updates` (the small side); disable it
    * only when uniqueness is guaranteed upstream.
    */
  def upsertByKey(base: DataFrame, updates: DataFrame, key: String,
      validateUniqueKeys: Boolean = true): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert requires identical schemas, got ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    if (validateUniqueKeys) {
      import org.apache.spark.sql.functions.{col, count, lit}
      val dups = updates.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).collect()
      require(dups.isEmpty,
        s"upsert: updates contain multiple rows for key ${dups.headOption.map(_.get(0)).orNull} " +
          "(and possibly others); dedup updates first or pass validateUniqueKeys = false")
    }
    updates.unionByName(base.join(updates.select(key), Seq(key), "left_anti"))
  }
}
