package graft

import org.apache.spark.sql.SparkSession

/** Perf isolation tool: runs each named query N times on SPARK_GRAFT_SF_DIR
  * and prints per-iteration seconds — separates one-time cost (planning,
  * codegen compile, parquet footer reads) from steady-state execution.
  * Usage: runMain graft.PerfProbe q1 [q2 ...] [-n3]
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val n = args.find(_.startsWith("-n"))
      .flatMap(_.drop(2).toIntOption)
      .getOrElse(3)
    val names = args.filterNot(_.startsWith("-"))
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")} " +
        s"(usage: PerfProbe <query>... [-n3]; -n must be attached, e.g. -n5)")
      sys.exit(1)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // Same SF-matched partition sizing as Bench (see comment there).
      .config("spark.sql.files.maxPartitionBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $name: ${times.map(t => f"$t%.3f").mkString(", ")} sec")
    }
    spark.stop()
  }
}
