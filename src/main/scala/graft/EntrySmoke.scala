package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's smoke check: default (cwd) warehouse, call
  * SparkEntry.entry, expect rows > 0. Run twice across JVMs to prove the
  * leftover-location guard (TableManager.deleteLeftoverLocation) holds.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"entry_rows":$n}""")
    require(n > 0, "entry produced no rows")
    spark.stop()
  }
}
