package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming extension (SURVEY.md §7.5): the reference is
  * batch-only; this adds the streaming ingestion path — file stream →
  * event-time windowed aggregation with a watermark → sink. Semantics are
  * batch-equivalent, so the DuckDB oracle checks the streaming result
  * against plain SQL over the same parquet.
  */
object StreamOps {

  /** Event-time tumbling-window aggregation over the events table, run as a
    * real streaming query (AvailableNow trigger — processes the backlog,
    * then stops; the 100 TB path is the same query with a continuous
    * trigger). Watermark bounds state: windows older than `watermark` are
    * finalized and evicted — without it, state grows unboundedly.
    *
    * Output: (event_type, window_start, events, sum_cents) — integers only;
    * cents are floored *per event* (floor(v*100+0.5)) so the sum is exact
    * integer arithmetic in any engine.
    */
  def windowedEventAgg(spark: SparkSession, eventsPath: String,
      queryName: String = "graft_stream_agg"): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema
    // FileStreamSource requires a directory; stage a symlink to the input
    // file in a temp dir (read-only testdata stays untouched).
    val src = java.nio.file.Paths.get(eventsPath)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) eventsPath
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft-stream")
        java.nio.file.Files.createSymbolicLink(dir.resolve(src.getFileName), src)
        dir.toString
      }
    val raw = spark.readStream.schema(schema).parquet(streamDir)
    // TIMESTAMP(NANOS) parquet arrives as LongType under the nanosAsLong
    // legacy conf — convert to a real event-time column for the watermark.
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
    val q = agg.writeStream
      .format("memory").queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .select(col("event_type"),
        date_format(col("w.start"), "yyyy-MM-dd").as("window_start"),
        col("events"), col("sum_cents"))
  }
}
