package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-level ingestion operators for the raw-text formats a crawl
  * pipeline lands before anything is parquet: JSONL with per-line
  * corruption tolerance. A 100 TB crawl ALWAYS contains malformed lines
  * (truncated uploads, encoding damage, mid-write snapshots); the job
  * must neither fail (FAILFAST) nor silently null them out (plain
  * PERMISSIVE) — it must split them into a quarantine channel that
  * preserves the raw bytes for re-crawl/forensics.
  */
object Ingest {

  /** Read a JSONL directory into (valid, quarantine):
    *  - `valid`: lines that parse under `schemaDdl` AND carry a non-null
    *    `idField`, projected to the schema's typed columns;
    *  - `quarantine`: the REMAINING lines, raw and untouched, with a
    *    `reason` column (`malformed` — the parser returned nothing —
    *    vs `missing_id` — valid JSON missing the primary key).
    *
    * Implementation is `spark.read.text` + `from_json` — a map-only,
    * whole-stage-codegen'd split with NO shuffle on either branch; at
    * scale both outputs stream partition-by-partition and the quarantine
    * side costs nothing when empty. Blank lines (trailing newlines,
    * empty files) are dropped outright rather than quarantined — they
    * carry no bytes worth keeping.
    *
    * Malformed detection uses `from_json`'s `columnNameOfCorruptRecord`
    * channel, NOT a null-struct check: under PERMISSIVE mode an
    * unparseable line yields a struct of null LEAVES (the struct itself
    * is non-null), so only the corrupt-record column distinguishes
    * "line didn't parse" from "line parsed but the field is absent".
    * A partially-salvaged line (some fields recovered before the damage)
    * still carries the corrupt marker and is triaged malformed — partial
    * salvage is not valid data (`IngestSpec` covers all three classes).
    */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
      schemaDdl: String, idField: String): (DataFrame, DataFrame) = {
    val schema = StructType.fromDDL(schemaDdl)
    require(schema.fieldNames.contains(idField),
      s"jsonlWithQuarantine: idField '$idField' is not in the schema " +
        s"(${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.contains("_corrupt_record"),
      "jsonlWithQuarantine: the schema must not declare _corrupt_record " +
        "(reserved for the malformed-line channel)")
    val parseSchema = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val lines = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .withColumn("__p", from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    val malformed = col("__p").isNull ||
      col("__p._corrupt_record").isNotNull
    val valid = lines
      .filter(!malformed && col(s"__p.$idField").isNotNull)
      .select(schema.fieldNames.map(f => col(s"__p.$f").as(f)).toSeq: _*)
    val quarantine = lines
      .filter(malformed || col(s"__p.$idField").isNull)
      .select(col("value").as("raw_line"),
        when(malformed, "malformed").otherwise("missing_id").as("reason"))
    (valid, quarantine)
  }
}
