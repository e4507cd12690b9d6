package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump a query's formatted physical plan: runMain graft.PlanDump <name> [mode]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val mode = args.lift(1).getOrElse("formatted")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    if (mode == "executed") {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      println(s)
      println(s"[plandump] ReusedExchange count: " +
        "ReusedExchange".r.findAllIn(s).length)
    } else println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    spark.stop()
  }
}
