package graft.config

import org.apache.spark.sql.types._

/** Pipeline configuration ADTs — the engine's declarative "query language".
  * Ref: src/config/models/pipeline.py:11-20 and siblings (SURVEY.md §2.E).
  * All case classes are Serializable: closures shipped to executors capture
  * only these config values and build runtime objects worker-side
  * (ref: docs/architecture.md:654-661, src/auth/strategy.py:179).
  */
final case class ConfigValidationException(errors: Seq[String])
    extends RuntimeException("Invalid pipeline config:\n  " + errors.mkString("\n  "))

/** Ref: src/config/models/endpoint.py:7-24. `resolvedUrl` fixes quirk Q4
  * (the reference prepends "/" in a validator then lstrips it in the executor).
  */
final case class EndpointConfig(
    name: String,
    baseUrl: String,
    urlPath: String = "",
    method: String = "GET",
    headers: Map[String, String] = Map.empty,
    params: Map[String, String] = Map.empty,
    requestTemplate: Option[String] = None,
    vendor: Option[String] = None,
    /** DDL schema of the JSON response body, e.g.
      * `"id STRING, customer STRING, status STRING"`. Declared-but-unused
      * in the reference (endpoint.py:15, quirk register); implemented for
      * real here: `SilverLayer.fromBronze` projects bronze `body_text`
      * through it into typed silver columns. */
    responseSchema: Option[String] = None
) {
  def resolvedUrl: String =
    if (urlPath.isEmpty) baseUrl
    else if (urlPath.matches("^https?://.*")) urlPath
    else baseUrl.stripSuffix("/") + "/" + urlPath.stripPrefix("/")
  def validate: Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (name.isEmpty) errs += "endpoint.name must be non-empty"
    if (!baseUrl.matches("^https?://.*")) errs += s"endpoint.base_url must be http(s)://, got '$baseUrl'"
    val methods = Set("GET", "POST", "PUT", "PATCH", "DELETE")
    if (!methods.contains(method)) errs += s"endpoint.method must be one of $methods, got '$method'"
    responseSchema.foreach { ddl =>
      try org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catch { case e: Exception =>
        errs += s"endpoint.response_schema is not valid DDL: ${e.getMessage}"
      }
    }
    errs.result()
  }
}

/** Ref: src/config/models/transport.py:8-49. */
final case class TlsConfig(
    verify: Boolean = true,
    caBundle: Option[String] = None,
    clientCert: Option[String] = None,
    clientKey: Option[String] = None
)
final case class TcpConnectionConfig(
    limit: Int = 100,
    limitPerHost: Int = 0, // 0 = unlimited
    ttlDnsCacheSeconds: Int = 300,
    forceClose: Boolean = false,
    tls: TlsConfig = TlsConfig()
)
final case class TransportConfig(
    transportType: String = "jdk-http",
    baseTimeoutSeconds: Double = 30.0,
    warmupTimeoutSeconds: Double = 10.0,
    tcpConnection: TcpConnectionConfig = TcpConnectionConfig(),
    diagnostics: Boolean = true,
    /** Transparent transport-level retry of stale keep-alive connection
      * failures for requests WITH bodies (POST/PUT). The JDK client and the
      * reference only auto-retry idempotent bodyless requests — a reset can
      * arrive after the server executed the request, so enabling this gives
      * at-least-once delivery of non-idempotent calls. Safe when the remote
      * API is idempotent per request (data fetch keyed by request_id). */
    retryNonIdempotent: Boolean = false
)

/** Discriminated auth union. Ref: src/config/models/auth.py:74-82. */
sealed trait AuthConfig extends Serializable { def authType: String }
case object NoAuth extends AuthConfig { val authType = "none" }
final case class BasicAuth(username: String, password: String) extends AuthConfig {
  val authType = "basic"
}
final case class BearerAuth(token: String) extends AuthConfig { val authType = "bearer" }
final case class OAuth2PasswordAuth(
    tokenUrl: String, clientId: String, clientSecret: String,
    username: String, password: String, refreshMarginSeconds: Long = 60
) extends AuthConfig { val authType = "oauth2_password" }
final case class OAuth2ClientCredentialsAuth(
    tokenUrl: String, clientId: String, clientSecret: String,
    refreshMarginSeconds: Long = 60
) extends AuthConfig { val authType = "oauth2_client_credentials" }

/** One middleware declaration: type + params.
  * Ref: src/config/models/middleware.py:8-42.
  * Retry defaults follow the code, not the docs (quirk Q12: max_attempts=10).
  */
sealed trait MiddlewareConfig extends Serializable { def middlewareType: String }
final case class RetryConfig(
    maxAttempts: Int = 10,
    retryStatusCodes: Set[Int] = Set(500, 502, 503, 504, 429),
    baseDelaySeconds: Double = 0.1,
    maxDelaySeconds: Double = 2.0
) extends MiddlewareConfig { val middlewareType = "retry" }
case object JsonBodyConfig extends MiddlewareConfig { val middlewareType = "json_body" }
case object LoggingConfig extends MiddlewareConfig { val middlewareType = "logging" }
case object TimingConfig extends MiddlewareConfig { val middlewareType = "timing" }
case object WorkerDiagConfig extends MiddlewareConfig { val middlewareType = "worker_diag" }
final case class StaticBearerConfig(token: String) extends MiddlewareConfig {
  val middlewareType = "bearer"
}
final case class HeaderAuthConfig(username: String, password: String) extends MiddlewareConfig {
  val middlewareType = "header"
}

/** Config-declared column type. Ref: DataType enum,
  * src/config/models/data_contract.py:31-44; conversion :110-152.
  * `struct` is rejected exactly like the reference (no conversion branch).
  */
final case class ColumnSpec(
    name: String,
    dataType: String,
    nullable: Boolean = true,
    description: Option[String] = None,
    elementType: Option[String] = None,
    keyType: Option[String] = None,
    valueType: Option[String] = None
) {
  def toStructField: StructField = {
    val md = description.map(d => new MetadataBuilder().putString("comment", d).build())
      .getOrElse(Metadata.empty)
    StructField(name, ColumnSpec.toSparkType(dataType, elementType, keyType, valueType), nullable, md)
  }
}
object ColumnSpec {
  private val primitives: Map[String, DataType] = Map(
    "string" -> StringType, "integer" -> IntegerType, "long" -> LongType,
    "float" -> FloatType, "double" -> DoubleType, "boolean" -> BooleanType,
    "timestamp" -> TimestampType, "date" -> DateType, "binary" -> BinaryType
  )
  def toSparkType(t: String, elem: Option[String], k: Option[String], v: Option[String]): DataType =
    t match {
      case p if primitives.contains(p) => primitives(p)
      case "array" =>
        val e = elem.getOrElse(throw ConfigValidationException(Seq("array type requires element_type")))
        ArrayType(toSparkType(e, None, None, None), containsNull = true)
      case "map" =>
        val kk = k.getOrElse(throw ConfigValidationException(Seq("map type requires key_type")))
        val vv = v.getOrElse(throw ConfigValidationException(Seq("map type requires value_type")))
        MapType(toSparkType(kk, None, None, None), toSparkType(vv, None, None, None),
          valueContainsNull = true)
      case other =>
        // `struct` is declared in the reference enum but unsupported (data_contract.py:146-148)
        throw ConfigValidationException(Seq(s"Unsupported type: $other"))
    }
}

/** Source table contract. Ref: src/config/models/data_contract.py:173-241. */
final case class SourceTableConfig(
    name: String,
    namespace: String,
    idColumn: String = "tracking_id",
    requiredColumns: Seq[String] = Seq.empty,
    schema: Seq[ColumnSpec] = Seq.empty
) {
  def identifier: String = s"$namespace.$name"
  /** id_column is force-added to required columns (data_contract.py:201-213). */
  def effectiveRequired: Seq[String] = (requiredColumns :+ idColumn).distinct
  /** Projection check against an actual column list.
    * Returns (ok, errors, warnings). Ref: data_contract.py:215-241.
    */
  def validateColumns(actual: Seq[String]): (Boolean, Seq[String], Seq[String]) = {
    val actualSet = actual.toSet
    val errs = Seq.newBuilder[String]
    effectiveRequired.filterNot(actualSet.contains)
      .foreach(c => errs += s"Required column '$c' not found in source")
    schema.map(_.name).filterNot(actualSet.contains)
      .foreach(c => errs += s"Schema column '$c' not found in source")
    val declared = (schema.map(_.name) ++ effectiveRequired).toSet
    val warns =
      if (schema.nonEmpty) actual.filterNot(declared.contains).map(c => s"Extra column '$c' in source")
      else Seq.empty
    val e = errs.result()
    (e.isEmpty, e, warns)
  }
}

/** Sink (bronze) table config — fixed schema, configurable placement.
  * Ref: src/config/models/data_contract.py:244-296; quirk Q10: `name` is
  * unqualified, identifier = namespace.name.
  */
final case class SinkTableConfig(
    name: String,
    namespace: String,
    mode: String = "append", // append | overwrite
    partitionBy: Seq[String] = Seq.empty,
    location: Option[String] = None,
    tableProperties: Map[String, String] = Map.empty,
    /** Header names (case-insensitive) to mask in the bronze
      * `request_headers` column, e.g. `Seq("Authorization")`. Deliberate
      * divergence from the reference (models.py build_row persists
      * credentials verbatim); default empty = reference parity. */
    redactHeaders: Seq[String] = Seq.empty
) {
  def identifier: String = s"$namespace.$name"
  def validate: Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (!Set("append", "overwrite").contains(mode))
      errs += s"sink.mode must be append|overwrite, got '$mode'"
    partitionBy.filterNot(graft.model.BronzeSchema.columns.contains)
      .foreach(c => errs += s"sink.partition_by column '$c' is not a bronze column")
    errs.result()
  }
}

/** Ref: src/config/models/data_contract.py:299-343. `transform` is quirk Q3:
  * declared-but-dead in the reference; implemented for real here.
  */
final case class ColumnMapping(
    sourceColumn: String,
    endpointParam: Option[String] = None,
    transform: Option[String] = None // upper | lower | strip
) {
  def validate: Seq[String] =
    transform.toSeq.collect {
      case t if !Set("upper", "lower", "strip").contains(t) =>
        s"column_mapping.transform must be upper|lower|strip, got '$t'"
    }
}

final case class TablesConfig(
    source: Option[SourceTableConfig] = None,
    sink: SinkTableConfig,
    columnMappings: Seq[ColumnMapping] = Seq.empty
) {
  /** endpoint_param -> source_column (data_contract.py:336-343). */
  def requestMapping: Map[String, String] =
    columnMappings.flatMap(m => m.endpointParam.map(_ -> m.sourceColumn)).toMap
}

/** Ref: src/config/models/execution.py:4-19. `maxRequestsPerSecond` is
  * quirk Q7: documented in the reference but unimplemented; here it is a
  * real per-partition token-bucket limit (None = unlimited).
  */
final case class ExecutionConfig(
    numPartitions: Int = 200,
    batchSize: Long = 10000L,
    maxAttempts: Int = 5,
    maxConcurrentRequests: Int = 20,
    maxRequestsPerSecond: Option[Double] = None
) {
  def validate: Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (numPartitions <= 0) errs += "execution.num_partitions must be > 0"
    if (batchSize <= 0) errs += "execution.batch_size must be > 0"
    if (maxAttempts <= 0) errs += "execution.max_attempts must be > 0"
    if (maxConcurrentRequests <= 0) errs += "execution.max_concurrent_requests must be > 0"
    errs.result()
  }
}

/** Top-level pipeline config. Ref: src/config/models/pipeline.py:11-20. */
final case class PipelineConfig(
    endpoint: EndpointConfig,
    transport: TransportConfig = TransportConfig(),
    auth: AuthConfig = NoAuth,
    middleware: Seq[MiddlewareConfig] = Seq.empty,
    tables: TablesConfig,
    execution: ExecutionConfig = ExecutionConfig()
) {
  def validate(): Unit = {
    val errs = endpoint.validate ++ tables.sink.validate ++
      tables.columnMappings.flatMap(_.validate) ++ execution.validate
    if (errs.nonEmpty) throw ConfigValidationException(errs)
  }
}
