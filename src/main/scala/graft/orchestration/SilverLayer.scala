package graft.orchestration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.config.PipelineConfig

/** Bronze → silver: project the raw JSON response body through the
  * endpoint's declared `response_schema` into typed columns.
  *
  * The reference declares `endpoint.response_schema` but never consumes it
  * (endpoint.py:15 — quirk register); here it is the silver-layer contract.
  * `from_json` is a codegen'd built-in, so the projection stays inside
  * whole-stage codegen and the parse cost is one pass over `body_text` —
  * no shuffle, safe at any scale.
  *
  * Failed rows (success = false or unparseable bodies) keep their
  * request_id with NULL silver columns so downstream joins can distinguish
  * "not fetched" from "fetched but empty" — filter on `success` to drop
  * them.
  */
object SilverLayer {

  private val passthrough = Seq("request_id", "success", "status_code")

  /** Flatten a bronze table using an explicit DDL schema. */
  def fromBronze(bronze: DataFrame, responseSchemaDdl: String): DataFrame = {
    val schema = StructType.fromDDL(responseSchemaDdl)
    val collisions = schema.fieldNames.filter(passthrough.contains)
    require(collisions.isEmpty,
      s"response_schema fields ${collisions.mkString(", ")} collide with the " +
        s"silver passthrough columns (${passthrough.mkString(", ")}); rename " +
        "them in the schema (the parsed value is still available under the new name)")
    bronze
      .withColumn("__parsed", from_json(col("body_text"), schema))
      .select(
        (Seq(col("request_id"), col("success"), col("status_code")) ++
          schema.fields.map(f => col(s"__parsed.${f.name}").as(f.name))): _*)
  }

  /** Flatten using the pipeline's configured endpoint.response_schema. */
  def fromBronze(bronze: DataFrame, config: PipelineConfig): DataFrame =
    config.endpoint.responseSchema match {
      case Some(ddl) => fromBronze(bronze, ddl)
      case None => throw new IllegalArgumentException(
        "endpoint.response_schema is not set; declare the response DDL to build a silver view")
    }
}
