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
  def upsertByKey(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert requires identical schemas, got ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    updates.unionByName(base.join(updates.select(key), Seq(key), "left_anti"))
  }
}
