package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.config._
import graft.exec.PartitionExecutor
import graft.model.BronzeSchema

/** DataSource V2 batch source `graft-http`: makes the API-ingestion
  * capability SQL-addressable (the optional extension SURVEY.md §4 sketches
  * — the reference exposes ingestion only through its orchestration entry
  * point, ref: src/orchestration/orchestrator.py:246-261).
  *
  * {{{
  * spark.read.format("graft-http")
  *   .option("url", "https://api.example.com/items")   // required
  *   .option("id_start", 1).option("id_end", 10001)    // id range, end-exclusive
  *   .option("id_param", "id")                         // query-param name
  *   .option("num_partitions", 64)
  *   .option("concurrency", 20)                        // in-flight per partition
  *   .load()                                           // → bronze-schema rows
  * }}}
  *
  * Scale design: the id range is split into `num_partitions` contiguous
  * [lo, hi) slices, one `InputPartition` each — at 1000 executors each task
  * runs its slice with the same bounded-concurrency streaming-window
  * executor as the orchestration path (`graft.exec.PartitionExecutor`), so
  * cluster-wide in-flight ≈ partitions × concurrency, with per-partition
  * token-bucket rate limiting available via `max_rps`. Column pruning is
  * pushed into the reader (`SupportsPushDownRequiredColumns`): a
  * `select(status_code)` materializes one column per row, not the full
  * bronze envelope.
  *
  * Other options: `method`, `timeout_seconds`, `retry_attempts` (>0 wires
  * the retry interceptor), `json_body` (default true), `max_rps`,
  * `bearer_token` | `basic_user`+`basic_pass`, static `header.<name>` /
  * `param.<name>` pass-through. Arbitrary per-row parameterization (ids
  * from a DataFrame, request templates, OAuth2) stays on the orchestration
  * API — a read-side source has no input rows by construction.
  */
final class HttpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BronzeSchema.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpTable(new CaseInsensitiveStringMap(properties))
}

private[sources] object HttpOptions {
  /** Parse + validate reader options into the engine's PipelineConfig plus
    * the id-range plan inputs. Runs on the driver at scan-build time so
    * misconfiguration fails fast, before tasks launch.
    */
  def parse(o: CaseInsensitiveStringMap): (PipelineConfig, Long, Long, Int, String) = {
    val url = Option(o.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-http: option 'url' is required"))
    val idStart = o.getLong("id_start", 0L)
    val idEnd = Option(o.get("id_end")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException("graft-http: option 'id_end' (exclusive) is required"))
    if (idEnd < idStart)
      throw new IllegalArgumentException(s"graft-http: id_end ($idEnd) < id_start ($idStart)")
    val idParam = Option(o.get("id_param")).getOrElse("id")
    val numPartitions = o.getInt("num_partitions", 32)

    val entries = o.asCaseSensitiveMap().asScala
    val headers = entries.collect {
      case (k, v) if k.toLowerCase.startsWith("header.") => k.drop("header.".length) -> v
    }.toMap
    val params = entries.collect {
      case (k, v) if k.toLowerCase.startsWith("param.") => k.drop("param.".length) -> v
    }.toMap

    val auth: AuthConfig =
      (Option(o.get("bearer_token")), Option(o.get("basic_user"))) match {
        case (Some(t), _) => BearerAuth(t)
        case (None, Some(u)) => BasicAuth(u, Option(o.get("basic_pass")).getOrElse(""))
        case _ => NoAuth
      }
    val middleware: Seq[MiddlewareConfig] =
      (if (o.getInt("retry_attempts", 0) > 0)
         Seq(RetryConfig(maxAttempts = o.getInt("retry_attempts", 0)))
       else Seq.empty) ++
        (if (o.getBoolean("json_body", true)) Seq(JsonBodyConfig) else Seq.empty)

    val cfg = PipelineConfig(
      endpoint = EndpointConfig("graft-http", url,
        method = Option(o.get("method")).getOrElse("GET").toUpperCase,
        headers = headers, params = params),
      transport = TransportConfig(
        baseTimeoutSeconds = o.getDouble("timeout_seconds", 30.0)),
      auth = auth,
      middleware = middleware,
      tables = TablesConfig(None,
        // sink config is unused by a read-side source; present because the
        // executor's contract carries redaction + param mapping through it
        SinkTableConfig("unused", "unused"),
        Seq(ColumnMapping("request_id", Some(idParam)))),
      execution = ExecutionConfig(
        numPartitions = numPartitions,
        maxConcurrentRequests = o.getInt("concurrency", 20),
        maxRequestsPerSecond =
          Option(o.get("max_rps")).map(_.toDouble)))
    cfg.validate()
    (cfg, idStart, idEnd, numPartitions, idParam)
  }
}

private final class HttpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-http(${options.get("url")})"
  override def schema(): StructType = BronzeSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  /** For `spark.read/.readStream.load()` the options arrive per-scan; for a
    * catalog table (`CREATE TABLE ... USING graft-http OPTIONS (...)`) they
    * were stored as table properties and the per-scan map is empty — merge
    * both, with per-scan keys winning.
    */
  private def merged(scanOptions: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    val m = new util.HashMap[String, String](options.asCaseSensitiveMap())
    m.putAll(scanOptions.asCaseSensitiveMap())
    new CaseInsensitiveStringMap(m)
  }

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(merged(caseInsensitiveOptions))

  /** Reverse-ETL write path: rows out as JSON request bodies (HttpWriter).
    * ACCEPT_ANY_SCHEMA: the outgoing body is keyed by whatever columns the
    * incoming DataFrame has — there is no fixed sink schema to cast to.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val o = merged(info.options())
    val url = Option(o.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-http write: option 'url' is required"))
    new WriteBuilder {
      override def build(): Write = new HttpWrite(
        url,
        Option(o.get("method")).getOrElse("POST").toUpperCase,
        o.asCaseSensitiveMap().asScala.collect {
          case (k, v) if k.toLowerCase.startsWith("header.") =>
            k.drop("header.".length) -> v
        }.toMap,
        o.getInt("concurrency", 20),
        o.getDouble("timeout_seconds", 30.0),
        o.getBoolean("fail_on_errors", true),
        info.schema(),
        Option(o.get("request_template")))
    }
  }
}

private final class HttpScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BronzeSchema.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val (cfg, idStart, idEnd, numPartitions, _) = HttpOptions.parse(options)
    val idsPerTrigger = Option(options.get("ids_per_trigger")).map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(idsPerTrigger > 0,
      s"graft-http: ids_per_trigger must be > 0, got $idsPerTrigger — a " +
        "non-positive cap would keep the stream's offset from ever advancing")
    new HttpScan(cfg, idStart, idEnd, numPartitions, required, idsPerTrigger)
  }
}

private final class HttpScan(cfg: PipelineConfig, idStart: Long, idEnd: Long,
    numPartitions: Int, required: StructType,
    idsPerTrigger: Long = Long.MaxValue) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-http ${cfg.endpoint.resolvedUrl} ids=[$idStart,$idEnd) partitions=$numPartitions"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    HttpScan.rangePartitions(idStart, idEnd, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpReaderFactory(cfg, required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new HttpMicroBatchStream(cfg, idStart, idEnd, numPartitions, required, idsPerTrigger)
}

/** Id-range slicing shared by the batch and micro-batch planners (public
  * for property tests: partition-of-unity over [start, end)).
  */
object HttpRanges {
  final case class IdRange(lo: Long, hi: Long)

  /** Contiguous [lo, hi) slices, remainder spread over the first slices. */
  def slices(idStart: Long, idEnd: Long, numPartitions: Int): IndexedSeq[IdRange] = {
    val total = idEnd - idStart
    val n = math.max(1, math.min(numPartitions.toLong, total).toInt)
    val base = total / n
    val rem = total % n
    val bounds = (0 to n).scanLeft(idStart) { (acc, i) =>
      acc + base + (if (i < rem) 1 else 0)
    }.take(n + 1).toIndexedSeq
    (0 until n).map(i => IdRange(bounds(i), bounds(i + 1)))
  }
}

private object HttpScan {
  def rangePartitions(idStart: Long, idEnd: Long, numPartitions: Int): Array[InputPartition] =
    HttpRanges.slices(idStart, idEnd, numPartitions)
      .map(r => HttpInputPartition(r.lo, r.hi): InputPartition).toArray
}

private final case class HttpOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** Streaming read path: the id space IS the offset axis. Each micro-batch
  * covers [committed, latest) ids; offsets are checkpointed by the engine,
  * so every id is fetched exactly once across restarts — the streaming
  * twin of the batch anti-join idempotency checkpoint, with the sink table
  * replaced by the offset log. A live API would poll its cursor endpoint
  * in `latestOffset`; this source's horizon is the configured `id_end`,
  * so a terminated trigger (AvailableNow/Once) drains the range and stops
  * while a continuous trigger idles at the horizon awaiting a larger cap.
  */
private final class HttpMicroBatchStream(cfg: PipelineConfig, idStart: Long, idEnd: Long,
    numPartitions: Int, required: StructType, idsPerTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = HttpOffset(idStart)
  override def latestOffset(): Offset = HttpOffset(idEnd)
  override def deserializeOffset(json: String): Offset = HttpOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // Admission control: `ids_per_trigger` caps each micro-batch — the
  // streaming analog of batch_size, bounding per-trigger API load and sink
  // commit size. AvailableNow then drains the range in capped chunks.
  override def getDefaultReadLimit: ReadLimit =
    if (idsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(idsPerTrigger)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[HttpOffset].id
    limit match {
      case r: ReadMaxRows => HttpOffset(math.min(s + r.maxRows(), idEnd))
      case _ => HttpOffset(idEnd)
    }
  }
  override def reportLatestOffset(): Offset = HttpOffset(idEnd)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    HttpScan.rangePartitions(
      start.asInstanceOf[HttpOffset].id, end.asInstanceOf[HttpOffset].id, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpReaderFactory(cfg, required)
}

private final case class HttpInputPartition(lo: Long, hi: Long) extends InputPartition

private final class HttpReaderFactory(cfg: PipelineConfig, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HttpInputPartition]
    new HttpPartitionReader(cfg, p.lo, p.hi, required)
  }
}

/** Runs the id slice through the shared bounded-concurrency executor and
  * adapts bronze Rows to pruned InternalRows.
  */
private final class HttpPartitionReader(cfg: PipelineConfig, lo: Long, hi: Long,
    required: StructType) extends PartitionReader[InternalRow] {

  private val inputSchema = StructType(Seq(StructField("request_id", StringType)))
  private val out: Iterator[Row] = PartitionExecutor.makeFn(cfg, None)(
    Iterator.range(lo, hi).map(i =>
      new GenericRowWithSchema(Array(i.toString), inputSchema): Row))

  // column pruning: map required field names to bronze row ordinals
  private val ordinals = required.fields.map(f => BronzeSchema.schema.fieldIndex(f.name))
  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)

  private var current: InternalRow = _
  override def next(): Boolean =
    if (!out.hasNext) false
    else {
      val row = out.next()
      current = toCatalyst(Row.fromSeq(ordinals.toSeq.map(row.get))).asInstanceOf[InternalRow]
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
