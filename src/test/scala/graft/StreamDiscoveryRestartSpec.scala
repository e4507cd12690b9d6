package graft

import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamOps

/** Restart semantics for the transformWithState discovery operator
  * (x129, Spark 4 state v2 on RocksDB): across a checkpointed restart the
  * MapState seen-set must suppress re-emission of already-discovered
  * (user, type) pairs and the ValueState counter must CONTINUE — the two
  * state primitives resuming independently from the same checkpoint.
  */
class StreamDiscoveryRestartSpec extends SparkSpec with Matchers {

  test("state v2 MapState/ValueState resume across a checkpointed restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-discovery").toString
    val streamDir = s"$root/in"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))

    def eventsFile(name: String, rows: Seq[(Long, String, Long, Long)]): Unit = {
      val tmp = s"$root/scratch-$name"
      rows.toDF("user_id", "event_type", "t", "event_id")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(t)")).drop("t")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/$name.parquet"))
    }

    // batch 1: user 1 shows view then click (and a repeat view)
    eventsFile("f1", Seq(
      (1L, "view", 1000L, 1L), (1L, "click", 2000L, 2L),
      (1L, "view", 3000L, 3L)))
    StreamOps.typeDiscoveryToDir(spark, streamDir, outDir, ckpt)
    val first = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("types_so_far"))).toSet
    first shouldBe Set((1L, "view", 1L), (1L, "click", 2L))

    // batch 2 after restart: a repeat click (suppressed by the restored
    // MapState) and a new purchase (counter continues at 3)
    eventsFile("f2", Seq(
      (1L, "click", 4000L, 4L), (1L, "purchase", 5000L, 5L)))
    StreamOps.typeDiscoveryToDir(spark, streamDir, outDir, ckpt)
    val all = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("types_so_far"))).toSet
    all shouldBe Set((1L, "view", 1L), (1L, "click", 2L),
      (1L, "purchase", 3L))
  }
}
