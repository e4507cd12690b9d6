package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...},
  * "iter_sec":{name:[t1,t2,t3],...}} — min-of-3 per query, with the raw
  * iteration times exposed so measurement noise is visible in the artifact.
  * Headliners cover every engine layer: scan/agg (b01), broadcast star join
  * (b02), window top-k (b03), stream-table agg (b04), exact + MinHash-LSH +
  * SimHash dedup (x01/x03/x04), brute-force ANN (x07), streaming window
  * (x14), anti-join (p05), and the full HTTP pipeline (e01).
  */
object Bench {
  private val headline = Seq(
    "b01_agg_lineitem", "b02_join_star", "b03_window_topk", "b04_events_by_type",
    // (b11_window_running is excluded: bench's count() action lets
    // Catalyst prune the unreferenced window, so its number would measure
    // a plain count, not the window.)
    "b05_rollup_revenue", "b09_tpch_q3_topk",
    "p05_anti_join", "x01_dedup_exact", "x03_dedup_minhash_lsh", "x04_dedup_simhash",
    "x07_ann_bruteforce", "x07b_ann_native_expr", "x08b_ann_ivf", "x14_stream_window_agg",
    "x15_sessionize", "x18_salted_join", "x20_stream_dedup", "x22_topk_aggregator",
    "x28_asof_join", "x29_range_join", "x30_doc_chunking", "x32_curation_pipeline",
    "x35_decontamination", "x36_repetition", "x37_pii_redaction", "x38_sequence_packing",
    "x23b_sketch_only",
    "e01_pipeline_noauth", "e09_dsv2_http")

  /** Bench-only twin of x23 with the exact aggregates stripped: times the
    * O(log n) sketch path itself (approx_count_distinct + approx_percentile)
    * — x23 proper stays the correctness gate, where the exact aggregates it
    * self-checks against dominate its runtime and would drown the signal.
    * Not in SparkEntry.queries: sketch values have no cross-engine oracle.
    */
  private val benchOnly: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("x23b_sketch_only" -> { (s, dd) =>
      import org.apache.spark.sql.functions._
      queries.QueryDef.events(s, dd)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          expr("approx_percentile(value, array(0.5, 0.99), 1000)").as("apcts"))
    })

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // Partition sizing for THIS SF (the knob the 100 TB deploy retunes):
      // sf0.1 files are sub-MB, but the text/dedup operators do heavy
      // per-row CPU (tokenize + md5 per token), so Spark's bytes-based
      // split sizing leaves whole pipelines on ONE task. 128 KB splits /
      // 64 KB coalesce floor spread those stages across the 32 threads; at
      // production scale with 100 MB+ files the defaults (128 MB / 1 MB)
      // are the right sizing and these two lines are what you'd change.
      .config("spark.sql.files.maxPartitionBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed session warm-up (executor threads, codegen, parquet footers).
    spark.range(1000).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries ++ benchOnly
    // JMH-style per-query warm-up at the TARGET SF: the untimed first run
    // pays one-time janino codegen + JIT for the exact post-AQE plan (a
    // smaller warm-up SF compiles DIFFERENT code — AQE picks different join
    // strategies at different sizes), so the timed run measures steady-state
    // execution — the regime a long-lived 1000-executor job runs in. Cold
    // (first-run, warm-up-free) seconds are reported alongside. Stateful
    // side effects are safe to repeat: e2e sinks are overwrite-mode and
    // streaming queries use fresh temp checkpoints per call.
    // Timed value = min of THREE post-warm-up iterations for EVERY query —
    // not just e*. Round 4 proved why: a machine-level contention spike
    // landed on one x04 iteration and min-of-2 recorded 5.72 s where an
    // immediate rerun measured 0.98 s; the official artifact hid a real
    // 2× speedup. min-of-3 absorbs a single-spike round, and the raw
    // per-iteration times are emitted in the JSON ("iter_sec") so any
    // remaining spread is visible IN the artifact instead of requiring a
    // forensic rerun to detect.
    val iters = 3
    val results = headline.filter(qs.contains).map { name =>
      val c0 = System.nanoTime()
      try { qs(name)(spark, sfDir).count() } catch { case _: Throwable => () }
      val cold = (System.nanoTime() - c0) / 1e9
      def timed(): Double = {
        val t0 = System.nanoTime()
        try { qs(name)(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val base = (1 to iters).map(_ => timed())
      // Adaptive re-measure: a >3× min-to-max spread means at least one
      // iteration hit machine-level contention (the r4 artifact bug class);
      // two extra iterations give min-of-5 a clean sample to find. All
      // iterations stay visible in iter_sec either way.
      val runs = if (base.max > 3 * base.min) base ++ (1 to 2).map(_ => timed()) else base
      (name, runs.min, cold, runs)
    }
    val qJson = results.map { case (k, v, _, _) => "\"" + k + f"""":${v}%.3f""" }
      .mkString("{", ",", "}")
    val wJson = results.map { case (k, _, c, _) => "\"" + k + f"""":${c}%.3f""" }
      .mkString("{", ",", "}")
    val iJson = results.map { case (k, _, _, rs) =>
      "\"" + k + "\":[" + rs.map(r => f"$r%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"cold_first_run_sec":$wJson,"iter_sec":$iJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
