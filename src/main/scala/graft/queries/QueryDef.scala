package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Oracle-less entries get the driver's weaker rows-only
  * check (engine-internal hashes like pmod(murmur3) have no cross-engine
  * twin).
  *
  * Determinism contract: every query ORDER-BYs its full key and projects
  * only exactly-reproducible values (integers, strings, booleans; floats
  * only as floor(x*1e6) of bit-identical arithmetic).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Read one of the sfDir parquet tables. */
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark only reads as LongType (spark.sql.legacy.parquet.nanosAsLong —
    * set in Verify/Bench/test sessions); convert to a microsecond timestamp
    * here. `div` keeps the arithmetic in exact integer space (ns epoch
    * values overflow double precision).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = tbl(spark, sfDir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
