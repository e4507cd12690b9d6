package graft.orchestration

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.config.{ExecutionConfig, PipelineConfig}
import graft.exec.PartitionExecutor
import graft.model.BronzeSchema

/** One batch through the API stage: mapPartitions → append to sink.
  * Ref: src/orchestration/batch_handler.py:21-47. Unlike the reference's
  * RDD hop (`rdd.mapPartitions` + `createDataFrame(rdd, schema)`), the
  * Dataset-level `mapPartitions` with an explicit Row encoder keeps the
  * bronze schema end-to-end and stays inside the same physical plan.
  */
final class BatchHandler(cfg: PipelineConfig, rpcUrl: Option[String], sinkIdentifier: String,
    format: String) {
  def process(batchDf: DataFrame): Unit = {
    val fn = PartitionExecutor.makeFn(cfg, rpcUrl)
    val bronze = batchDf.mapPartitions(fn)(Encoders.row(BronzeSchema.schema))
    // Sink mode is handled at table-create time (overwrite = CREATE OR
    // REPLACE); per-batch writes are always appends (batch_handler.py:47).
    // insertInto matches by POSITION, and a partitioned table's catalog
    // schema moves partition columns last — align to the table's own
    // column order so PARTITIONED BY sinks don't mis-bind columns.
    val tableOrder = batchDf.sparkSession.table(sinkIdentifier).schema.fieldNames
    bronze.select(tableOrder.map(col(_)).toSeq: _*)
      .write.format(format.toLowerCase).mode("append").insertInto(sinkIdentifier)
  }
}

/** Driver-side idempotent batch loop. Ref: src/orchestration/batch_processor.py.
  *
  * Per attempt (1..maxAttempts): remaining = source ⟕anti sink on request_id
  * (completed rows live in the sink — the sink IS the checkpoint); empty →
  * done; assign `batch_id = pmod(hash(request_id), numBatches)` (pmod fixes
  * quirk Q8's negative ids); repartition to spread the slow HTTP stage
  * (docstring batch_processor.py:10-17: prevents AQE from collapsing the
  * small batch into too few partitions); enumerate batch ids; filter + hand
  * each batch to the handler. Failures are logged and re-raised only on the
  * final attempt (batch_processor.py:87-96).
  *
  * Scale notes (100 TB): the anti-join shuffles source+sink on request_id —
  * Catalyst/AQE picks broadcast when the remaining side shrinks below the
  * threshold, and only `request_id` is projected from the sink before the
  * join, so the shuffle carries one column, not 15. Batch sizing bounds the
  * rows in flight per Spark job (memory guardrail, docs/architecture.md:28-35).
  */
object BatchProcessor {
  import org.apache.spark.sql.Column

  /** Default batch assignment: murmur3 `hash()` — same function family the
    * reference's PySpark `hash()` uses (batch_processor.py:65-70), pmod for
    * quirk Q8's negative ids. */
  def batchId(requestId: Column, numBatches: Long): Column =
    pmod(hash(requestId), lit(numBatches))

  /** Portable batch assignment: first 56 bits of md5, reproducible outside
    * the JVM (DuckDB twin: `('0x'||substr(md5(s),1,14))::BIGINT % n`). Same
    * operator semantics, engine-checkable assignment — used by the p07
    * oracle and available for cross-engine reconciliation jobs. */
  def portableBatchId(requestId: Column, numBatches: Long): Column =
    pmod(conv(substring(md5(requestId.cast("string")), 1, 14), 16, 10).cast("long"),
      lit(numBatches))
}

final class BatchProcessor(
    spark: SparkSession,
    source: DataFrame,
    sinkIdentifier: String,
    exec: ExecutionConfig) {

  def remaining(): DataFrame =
    source.join(
      spark.table(sinkIdentifier).select("request_id"),
      Seq("request_id"), "left_anti")

  def process(handler: DataFrame => Unit): Unit = {
    var attempt = 1
    var done = false
    while (attempt <= exec.maxAttempts && !done) {
      // Stage the per-attempt remaining set. Without this, every batch's
      // action re-executes the full source∖sink anti-join and repartition
      // shuffle — numBatches × full rescans per attempt (the reference has
      // the same flaw, batch_processor.py:56-57,76-81; at 100 TB it's a
      // scale-killer). DISK_ONLY: the remaining set can be near-source-sized
      // on attempt 1 and must not evict executor heap.
      val rem = remaining().persist(StorageLevel.DISK_ONLY)
      try {
        val total = rem.count() // materializes the cache: the ONE anti-join per attempt
        if (total == 0L) done = true
        else {
          val numBatches = math.max(1L, (total + exec.batchSize - 1) / exec.batchSize)
          val batched = rem
            .withColumn("batch_id", BatchProcessor.batchId(col("request_id"), numBatches))
            .repartition(exec.numPartitions)
            .persist(StorageLevel.DISK_ONLY)
          try {
            // The reference enumerates ids with distinct().collect()
            // (batch_processor.py:79-81) — a full extra scan of the remaining
            // set per attempt. pmod already bounds ids to [0, numBatches), so
            // iterate the range directly; a hash-empty batch is a no-op write.
            val batchIds = 0L until numBatches
            batchIds.foreach { id =>
              try handler(batched.filter(col("batch_id") === id).drop("batch_id"))
              catch {
                case e: Exception if attempt < exec.maxAttempts =>
                  System.err.println(s"[BatchProcessor] batch $id failed on attempt $attempt: ${e.getMessage}")
                case e: Exception => throw e
              }
            }
          } finally batched.unpersist(blocking = false)
          attempt += 1
        }
      } finally rem.unpersist(blocking = false)
    }
  }
}
