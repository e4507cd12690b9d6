package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.auth.AuthStrategy
import graft.config.PipelineConfig
import graft.exec.WorkerResources
import graft.orchestration.{BatchHandler, BatchProcessor, PipelineOrchestrator, TableManager}

/** Streaming ingestion path (SURVEY.md §7.5): the reference is batch-only;
  * this runs the SAME request pipeline (middleware → transport → bronze
  * contract) from a Structured Streaming source via `foreachBatch`, reusing
  * `BatchHandler` unchanged.
  *
  * Idempotency: each micro-batch left-anti-joins the sink on `request_id`
  * before the HTTP stage — the sink IS the checkpoint, exactly like the
  * batch loop (batch_processor.py:36-40). That makes the pipeline safe
  * under BOTH replay regimes:
  *   - normal micro-batch replay after failure (source checkpoint rewinds),
  *   - full checkpoint loss (a fresh checkpoint re-reads everything; the
  *     anti-join drops every already-ingested row).
  * Late-arriving duplicates of already-processed ids are dropped the same
  * way — no watermark state needed for dedup, so state size is zero.
  *
  * Scale: identical to the batch path per micro-batch — the anti-join
  * projects one column from the sink, the HTTP stage is
  * partition-parallel, and the append is a blind write.
  */
object StreamingPipeline {

  /** Running pipeline handle: await/stop the query, then `close()` to tear
    * down the auth runtime (token refresher + RPC server).
    */
  final case class Handle(query: StreamingQuery, close: () => Unit)

  /** Start the streaming pipeline over `stream` (a streaming DataFrame).
    *
    * @param sourceId column holding the request id
    * @param trigger  defaults to AvailableNow (drain backlog, then stop) —
    *                 pass `Trigger.ProcessingTime(..)` for continuous runs
    */
  def start(
      spark: SparkSession,
      config: PipelineConfig,
      stream: DataFrame,
      sourceId: String,
      queryName: String = "graft_stream_pipeline",
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): Handle = {

    val tables = new TableManager(spark)
    tables.createTable(config.tables.sink)
    val sink = config.tables.sink.identifier

    implicit val ec: scala.concurrent.ExecutionContext = WorkerResources.executionContext
    val driverHost = spark.conf.getOption("spark.driver.host").getOrElse("127.0.0.1")
    val (rpcUrl, stopRuntime) = AuthStrategy.startRuntime(config.auth, driverHost)
    val handler = new BatchHandler(config, rpcUrl, sink, tables.format)

    val source = PipelineOrchestrator.prepareSource(config, stream, sourceId)

    val writer = source.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch runs in a CLONED SparkSession whose table-relation
        // cache is independent of the outer session's. Refresh before
        // processing (the clone may have inherited a stale pre-insert file
        // listing) and refresh the outer session after the appends so
        // callers and the next query run see the new files.
        val s = batch.sparkSession
        s.catalog.refreshTable(sink)
        // Identical semantics to the batch path per micro-batch: the SAME
        // BatchProcessor does the sink anti-join, batch_size splitting,
        // repartition(num_partitions) widening, and the driver retry loop.
        new BatchProcessor(s, batch, sink, config.execution).process(handler.process)
        spark.catalog.refreshTable(sink)
      }
      .trigger(trigger)
    checkpointDir.foreach(writer.option("checkpointLocation", _))

    val query =
      try writer.start()
      catch { case e: Throwable => stopRuntime(); throw e }
    Handle(query, stopRuntime)
  }
}
