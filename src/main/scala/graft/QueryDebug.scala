package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner for debugging: runMain graft.QueryDebug <name> [sfDir]. */
object QueryDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(20, false)
    // if this was an e2e query, surface the full bronze error detail
    spark.catalog.listDatabases().collect().filter(_.name == "graft_verify").foreach { _ =>
      spark.catalog.listTables("graft_verify").collect().foreach { t =>
        println(s"--- bronze table ${t.name}")
        spark.table(s"graft_verify.${t.name}")
          .groupBy("status_code", "success", "error_message").count().show(10, false)
      }
    }
    spark.stop()
  }
}
