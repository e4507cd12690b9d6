package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** The operational "what is this stream holding right now" story, made
  * uniform (round-10 verdict task): every stateful operator class on
  * the query surface reads back through the statestore source against a
  * LIVE checkpoint — the custom state-v2 processors via their typed
  * consumers, the built-in operators (windowed aggregate, streaming
  * dedup, stream-stream join, chained operators) via
  * `StreamOps.stateStoreRows`. Each test drives a real checkpoint and
  * value-pins what the state holds.
  */
class StreamStateReadbackSpec extends SparkSpec with Matchers {

  private val H = 3600000000L // 1h in us

  private def stageFile(dir: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$dir-scratch-$name"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
    ()
  }

  private def events(rows: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "t")
      .withColumn("ts", expr("timestamp_micros(t)")).drop("t")
  }

  test("discovery MapState + ValueState read back the full memory and the counters") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-rb-disc").toString
    val streamDir = s"$root/in"
    stageFile(streamDir, "f1", Seq(
        (1L, "click", 1 * H, 100L), (1L, "view", 2 * H, 101L),
        (1L, "click", 3 * H, 102L), (2L, "view", 1 * H, 103L))
      .toDF("user_id", "event_type", "t", "event_id")
      .withColumn("ts", expr("timestamp_micros(t)")).drop("t"))
    StreamOps.typeDiscoveryToDir(spark, streamDir, s"$root/out", s"$root/ckpt")
    // MapState "seen": every discovered (user, type) with its first t
    StreamOps.discoverySeenFromState(spark, s"$root/ckpt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq shouldBe Seq(
        (1L, "click", 1 * H), (1L, "view", 2 * H), (2L, "view", 1 * H))
    // ValueState "n_types": the counters the next batch continues from
    StreamOps.discoveryTypeCountFromState(spark, s"$root/ckpt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq shouldBe
      Seq((1L, 2L), (2L, 1L))
  }

  test("built-in windowed-aggregate state reads back: open windows with their running counts") {
    val root = java.nio.file.Files.createTempDirectory("graft-rb-agg").toString
    val streamDir = s"$root/in"
    // watermark ends at 10h - 1h = 9h: the 1h-2h window is CLOSED
    // (emitted, evicted), the 10h-11h window is OPEN (in state)
    stageFile(streamDir, "f1",
      events((1L, 1 * H), (1L, 1 * H + H / 2), (1L, 10 * H), (2L, 10 * H)))
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema).parquet(streamDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id")).count()
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val state = StreamOps.stateStoreRows(spark, s"$root/ckpt")
    state.selectExpr("key.user_id", "unix_micros(key.window.start)",
        "value.`count`").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq shouldBe Seq((1L, 10 * H, 1L), (2L, 10 * H, 1L))
  }

  test("chained dedup + aggregate state reads back per operator id") {
    val root = java.nio.file.Files.createTempDirectory("graft-rb-chain").toString
    val streamDir = s"$root/in"
    stageFile(streamDir, "f1", events(
      (1L, 10 * H), (1L, 10 * H), (2L, 10 * H), (2L, 1 * H)))
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema).parquet(streamDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "ts")
      .groupBy(window(col("ts"), "1 hour"), col("user_id")).count()
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // both operators are readable from ONE checkpoint under their own
    // ids — dispatch on the KEY SCHEMA, not an assumed order (the live
    // dump surfaced the aggregate as id 0 and the dedup as id 1)
    val ops = (0L to 1L).map { id =>
      StreamOps.stateStoreRows(spark, s"$root/ckpt", operatorId = Some(id))
    }
    val byCols = ops.map(df => df.schema.fieldNames.toSeq -> df)
    val dedup = byCols.find(!_._2.schema("key").dataType.simpleString
      .contains("window")).get._2
    val agg = byCols.find(_._2.schema("key").dataType.simpleString
      .contains("window")).get._2
    // dedup state: the distinct (user, ts) keys not yet evicted
    dedup.selectExpr("key.user_id").collect().map(_.getLong(0))
      .sorted.toSeq shouldBe Seq(1L, 2L)
    // aggregate state: the open 10h window for both users
    agg.selectExpr("key.user_id", "value.`count`").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq shouldBe Seq((1L, 1L), (2L, 1L))
  }

  test("v1 GroupState (flatMapGroupsWithState alerts) reads back the per-user running cents") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-rb-v1").toString
    val streamDir = s"$root/in"
    stageFile(streamDir, "f1", Seq(
        (1L, 1.5, 1 * H), (1L, 1.0, 2 * H), (2L, 0.8, 1 * H))
      .toDF("user_id", "value", "t")
      .withColumn("ts", expr("timestamp_micros(t)")).drop("t"))
    StreamOps.thresholdAlertsToDir(spark, streamDir, s"$root/out",
      s"$root/ckpt", thresholdCents = 100L)
    // v1 GroupState surfaces as (key struct, value struct) with the
    // user state wrapped ONE struct deeper than state-v2's: flattening
    // key gives the group key, flattening value gives a single struct
    // holding the Long state
    val flat = StreamOps.stateStoreRows(spark, s"$root/ckpt")
      .selectExpr("key.*", "value.*")
    flat.columns.length shouldBe 2
    flat.collect().map(r => (r.getLong(0), r.getStruct(1).getLong(0)))
      .sortBy(_._1).toSeq shouldBe Seq((1L, 250L), (2L, 80L))
  }

  test("stream-stream join state reads back per side") {
    val root = java.nio.file.Files.createTempDirectory("graft-rb-join").toString
    val lDir = s"$root/l"; val rDir = s"$root/r"
    stageFile(lDir, "f1", events((1L, 10 * H), (3L, 10 * H)))
    stageFile(rDir, "f1", events((1L, 10 * H), (2L, 10 * H)))
    val ls = spark.read.parquet(lDir).schema
    val l = spark.readStream.schema(ls).parquet(lDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"))
    val r = spark.readStream.schema(ls).parquet(rDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"))
    val q = l.join(r, col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") && col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR"))
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // each side's buffer is independently visible: everything not yet
    // evicted by the watermark, matched or not
    StreamOps.stateStoreRows(spark, s"$root/ckpt",
        joinSide = Some("left"))
      .selectExpr("value.l_user").collect().map(_.getLong(0))
      .sorted.toSeq shouldBe Seq(1L, 3L)
    StreamOps.stateStoreRows(spark, s"$root/ckpt",
        joinSide = Some("right"))
      .selectExpr("value.r_user").collect().map(_.getLong(0))
      .sorted.toSeq shouldBe Seq(1L, 2L)
  }
}
