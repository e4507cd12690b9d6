package graft

import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** Spark 4's state-store DATA SOURCE read against graft's own streaming
  * checkpoints — the operational tool that answers "what is this query
  * holding in state right now" without instrumenting the query: the
  * alert operator's per-user running totals, read straight out of the
  * checkpoint as a DataFrame and cross-checked against the batch sums.
  */
class StateIntrospectionSpec extends SparkSpec with Matchers {

  test("statestore source reads the alert operator's running totals from the checkpoint") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stateread").toString
    val streamDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
    val rows = Seq((1L, 70.0), (1L, 50.0), (2L, 10.0), (3L, 99.99))
    val tmp = s"$root/scratch"
    rows.toDF("user_id", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(1000000)"))
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$streamDir/f1.parquet"))
    StreamOps.thresholdAlertsToDir(spark, streamDir, outDir, ckpt,
      thresholdCents = 5000L)

    // the state rows ARE the operator's per-user running totals: key =
    // the group key, value.groupState = the GroupState[Long] payload
    val state = spark.read.format("statestore").load(ckpt)
      .selectExpr("key.value AS user_id",
        "value.groupState.value AS cents_total")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    state shouldBe Map(1L -> 12000L, 2L -> 1000L, 3L -> 9999L)

    // and after more spend arrives, the checkpoint state advances with it
    val tmp2 = s"$root/scratch2"
    Seq((2L, 40.0)).toDF("user_id", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(2000000)"))
      .coalesce(1).write.parquet(tmp2)
    val part2 = new java.io.File(tmp2).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part2.toPath,
      java.nio.file.Paths.get(s"$streamDir/f2.parquet"))
    StreamOps.thresholdAlertsToDir(spark, streamDir, outDir, ckpt,
      thresholdCents = 5000L)
    val after = spark.read.format("statestore").load(ckpt)
      .selectExpr("key.value AS user_id",
        "value.groupState.value AS cents_total")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    after(2L) shouldBe 5000L
  }
}
