package graft

import org.apache.spark.sql.SparkSession

import graft.orchestration.PipelineOrchestrator

/** User-facing CLI: run a declarative pipeline from a YAML/JSON config
  * against a parquet source — the Scala twin of the reference's
  * `run_pipeline(spark, config_path, source_df, source_id)` entry
  * (ref: dags/scripts/run_demo_pipeline.py:69-110).
  *
  * Usage: runMain graft.RunPipelineCli <config.(yml|json)> [sourceParquet idColumn]
  * Without a source argument the config must declare tables.source.
  */
object RunPipelineCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunPipelineCli <config> [sourceParquet idColumn]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (sourceDf, sourceId) = args.toSeq match {
      case Seq(_, src, id) => (Some(spark.read.parquet(src)), Some(id))
      case _               => (None, None)
    }
    PipelineOrchestrator.runPipelineFromFile(spark, args(0), sourceDf, sourceId)
    println("""{"pipeline":"completed"}""")
    spark.stop()
  }
}
