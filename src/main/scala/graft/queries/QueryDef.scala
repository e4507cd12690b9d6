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

  /** The events table's `ts` has shipped as two parquet physical types
    * across testdata generations, and both must normalize to a session-tz
    * TIMESTAMP so `unix_micros`/windowing behave identically:
    *  - TIMESTAMP(NANOS), which Spark only reads as LongType
    *    (spark.sql.legacy.parquet.nanosAsLong — set in Verify/Bench/test
    *    sessions): convert via `div 1000` in exact integer space (ns epoch
    *    values overflow double precision);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as
    *    TIMESTAMP_NTZ: cast to TIMESTAMP — sessions run UTC, so the
    *    wall-clock reading is the same instant DuckDB's naive TIMESTAMP
    *    sees and `epoch_us` agrees across engines.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = tbl(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
