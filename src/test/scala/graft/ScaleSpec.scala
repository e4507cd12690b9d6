package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.matchers.should.Matchers

import graft.config.SinkTableConfig
import graft.orchestration.TableManager

/** Storage-layout guardrails for the 100 TB posture: partition pruning on
  * a partitioned sink and shuffle-free co-located joins on bucketed tables.
  */
class ScaleSpec extends SparkSpec with Matchers {

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("partitioned sink: scans prune to the selected partition directories") {
    val dir = Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.partitionBy("o_orderstatus").parquet(s"$dir/orders_part")
    val scan = spark.read.parquet(s"$dir/orders_part")
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O")
      .select("o_orderkey")
    val plan = fmt(scan)
    plan should include("PartitionFilters")
    // the predicate must land in PartitionFilters (directory pruning),
    // NOT in PushedFilters (row-group evaluation)
    plan.linesIterator.find(_.contains("PartitionFilters:")).get should
      include("o_orderstatus")
  }

  test("bronze sink accepts partition_by and records it in the catalog") {
    val tm = new TableManager(spark)
    spark.sql("DROP TABLE IF EXISTS demo.part_bronze")
    tm.createTable(SinkTableConfig("part_bronze", "demo", mode = "append",
      partitionBy = Seq("method")))
    val cols = spark.sql("DESCRIBE TABLE demo.part_bronze").collect().map(_.getString(0))
    cols should contain("# Partition Information")
    spark.sql("DROP TABLE IF EXISTS demo.part_bronze")
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS demo.orders_bkt")
    spark.sql("DROP TABLE IF EXISTS demo.cust_bkt")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("demo.orders_bkt")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("demo.cust_bkt")
    val joined = spark.conf.get("spark.sql.autoBroadcastJoinThreshold") match {
      case old =>
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          val df = spark.table("demo.orders_bkt")
            .join(spark.table("demo.cust_bkt"),
              org.apache.spark.sql.functions.col("o_custkey") ===
                org.apache.spark.sql.functions.col("c_custkey"))
          val plan = fmt(df)
          plan should include("SortMergeJoin")
          // co-located buckets: zero Exchange nodes anywhere in the plan
          (plan should not).include("Exchange")
          df
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
    // and the join is still correct
    joined.count() shouldBe spark.read.parquet(s"$sfDir/orders.parquet").count()
    spark.sql("DROP TABLE IF EXISTS demo.orders_bkt")
    spark.sql("DROP TABLE IF EXISTS demo.cust_bkt")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the executed plan)") {
    import org.apache.spark.sql.functions._
    // hot key 0 carries ~100k rows vs ~10 for every other key; thresholds
    // lowered so the 100 TB skew shape reproduces at test scale
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.range(100000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS df's own queryExecution (count()/write plan separate
      // queries) so the adaptive plan finalizes with runtime statistics
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should include("skew=true")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
