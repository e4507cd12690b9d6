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
}
