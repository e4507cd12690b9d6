package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-mutation Spark-JOB profiler (round-15 verdict #2): the
  * maintenance family's wall cost at bench scale is almost entirely
  * per-absorb FIXED job count (~55 jobs measured in round 15), not
  * data volume — so the optimization loop needs to see WHICH actions
  * launch them. Runs the x152b (one absorb) or x158b (three-micro-batch
  * drain) bench body with a listener recording every job's call site,
  * then prints one line per distinct site with its job count, plus the
  * total. Staging (scratch copy, chunk staging) runs before the
  * listener's capture window, exactly like the bench's untimed setup.
  *
  * Usage: runMain graft.JobProbe [absorb|drain] — data dir from
  * SPARK_GRAFT_SF_DIR (default sf0.01; job COUNTS are SF-independent,
  * which is the point).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("absorb")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var capture = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (capture) {
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs.add(site); ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warm run first (schema caches seed, JIT) — mirrors the bench's
    // converged-warm regime, where the fixed job count is what remains
    def body(): Unit = mode match {
      case "drain" =>
        queries.EvalQueries.stageProdDrainScratch(spark, sfDir)
        queries.EvalQueries.prodDrainOnScratch(spark, sfDir).count()
        ()
      case _ =>
        queries.EvalQueries.stageProdAbsorbScratch(spark, sfDir)
        queries.EvalQueries.prodAbsorbOnScratch(spark, sfDir).count()
        ()
    }
    body() // warm (uncaptured)
    mode match {
      case "drain" =>
        queries.EvalQueries.stageProdDrainScratch(spark, sfDir)
        capture = true
        queries.EvalQueries.prodDrainOnScratch(spark, sfDir).count()
      case _ =>
        queries.EvalQueries.stageProdAbsorbScratch(spark, sfDir)
        capture = true
        queries.EvalQueries.prodAbsorbOnScratch(spark, sfDir).count()
    }
    capture = false
    Thread.sleep(500) // let trailing listener events drain
    import scala.jdk.CollectionConverters._
    val bySite = jobs.asScala.toSeq.groupBy(identity)
      .map { case (k, v) => (k, v.size) }.toSeq.sortBy(-_._2)
    bySite.foreach { case (site, n) => println(f"$n%4d  $site") }
    println(s"""{"mode":"$mode","total_jobs":${jobs.size}}""")
    spark.stop()
  }
}
