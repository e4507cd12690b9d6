package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Paths}
import graft.util.Json._

/** YAML/JSON pipeline-config loader: read → preprocess → validate → ADT.
  * Ref: src/config/loader.py:10-68 (yaml.safe_load + Pydantic model_validate)
  * and src/config/preprocessor.py:36-64 (secret substitution).
  *
  * The reference resolves `{{secret.SCOPE:KEY}}` via Databricks dbutils on
  * the driver before validation (docs/configuration.md:182). Offline
  * equivalent here: `{{env.NAME}}` resolves from the driver's environment —
  * same property (workers never see the secret store), pluggable resolver
  * for other stores.
  */
object ConfigLoader {
  private lazy val yamlMapper: ObjectMapper = {
    // jackson-dataformat-yaml ships on the Spark classpath; probe at runtime
    // so JSON-only environments still work (SURVEY.md §7 constraint).
    val factoryCls = Class.forName("com.fasterxml.jackson.dataformat.yaml.YAMLFactory")
    val factory = factoryCls.getDeclaredConstructor().newInstance()
    new ObjectMapper(factory.asInstanceOf[com.fasterxml.jackson.core.JsonFactory])
  }
  private val jsonMapper = new ObjectMapper()

  private val envPattern = raw"\{\{\s*env\.([A-Za-z_][A-Za-z0-9_]*)\s*\}\}".r
  private val secretPattern = raw"\{\{\s*secret\.([A-Za-z0-9_-]+):([A-Za-z0-9_-]+)\s*\}\}".r

  /** `{{env.NAME}}` → environment value; `{{secret.SCOPE:KEY}}` (the
    * reference's Databricks-secret syntax, preprocessor.py:36-64) → the
    * pluggable `secrets` resolver, defaulting to env `SCOPE_KEY`. Both
    * resolve driver-side before validation so workers never see a secret
    * store (docs/configuration.md:182).
    */
  def preprocess(text: String, env: String => Option[String] = sys.env.get,
      secrets: (String, String) => Option[String] = (s, k) => sys.env.get(s"${s}_$k")): String = {
    val withSecrets = secretPattern.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(
        secrets(m.group(1), m.group(2)).getOrElse(
          throw ConfigValidationException(
            Seq(s"Unresolved config secret: ${m.group(1)}:${m.group(2)}")))))
    envPattern.replaceAllIn(withSecrets, m =>
      scala.util.matching.Regex.quoteReplacement(
        env(m.group(1)).getOrElse(
          throw ConfigValidationException(Seq(s"Unresolved config variable: env.${m.group(1)}")))))
  }

  private def defaultSecrets: (String, String) => Option[String] =
    (s, k) => sys.env.get(s"${s}_$k")

  def fromYamlString(text: String, env: String => Option[String] = sys.env.get,
      secrets: (String, String) => Option[String] = defaultSecrets): PipelineConfig =
    decode(yamlMapper.readTree(preprocess(text, env, secrets)))
  def fromJsonString(text: String, env: String => Option[String] = sys.env.get,
      secrets: (String, String) => Option[String] = defaultSecrets): PipelineConfig =
    decode(jsonMapper.readTree(preprocess(text, env, secrets)))

  def fromFile(path: String): PipelineConfig = {
    val text = Files.readString(Paths.get(path))
    if (path.endsWith(".json")) fromJsonString(text) else fromYamlString(text)
  }

  // ---- tree -> ADT decoding (the "model_validate" step) ----

  def decode(root: JsonNode): PipelineConfig = {
    val errs = Seq.newBuilder[String]
    def require[T](o: Option[T], msg: String): Option[T] = { if (o.isEmpty) errs += msg; o }

    val endpointNode = Option(root.get("endpoint"))
    if (endpointNode.isEmpty) errs += "missing required section: endpoint"
    val endpoint = endpointNode.map { n =>
      EndpointConfig(
        name = str(n, "name").getOrElse { errs += "endpoint.name is required"; "" },
        baseUrl = str(n, "base_url").getOrElse { errs += "endpoint.base_url is required"; "" },
        urlPath = str(n, "url_path").getOrElse(""),
        method = str(n, "method").getOrElse("GET").toUpperCase,
        headers = strMap(n, "headers"),
        params = strMap(n, "params"),
        requestTemplate = Option(n.get("request_template")).filterNot(_.isNull).map(t =>
          if (t.isTextual) t.asText() else t.toString), // dict templates → canonical JSON
        vendor = str(n, "vendor"),
        responseSchema = str(n, "response_schema"))
    }

    val transport = Option(root.get("transport")).map(decodeTransport).getOrElse(TransportConfig())
    val auth = Option(root.get("auth")).map(n => decodeAuth(n, errs += _)).getOrElse(NoAuth)
    val middleware = arr(root, "middleware").map(n => decodeMiddleware(n, errs += _)).flatten

    val tablesNode = Option(root.get("tables"))
    if (tablesNode.isEmpty) errs += "missing required section: tables"
    val tables = tablesNode.flatMap { n =>
      val sink = require(Option(n.get("sink")), "tables.sink is required").map { s =>
        SinkTableConfig(
          name = str(s, "name").getOrElse { errs += "tables.sink.name is required"; "" },
          namespace = str(s, "namespace").getOrElse { errs += "tables.sink.namespace is required"; "" },
          mode = str(s, "mode").getOrElse("append"),
          partitionBy = arr(s, "partition_by").map(_.asText()),
          location = str(s, "location"),
          tableProperties = strMap(s, "table_properties"),
          redactHeaders = arr(s, "redact_headers").map(_.asText()))
      }
      val source = Option(n.get("source")).filterNot(_.isNull).map { s =>
        SourceTableConfig(
          name = str(s, "name").getOrElse { errs += "tables.source.name is required"; "" },
          namespace = str(s, "namespace").getOrElse { errs += "tables.source.namespace is required"; "" },
          idColumn = str(s, "id_column").getOrElse("tracking_id"),
          requiredColumns = arr(s, "required_columns").map(_.asText()),
          schema = arr(s, "schema").map(decodeColumnSpec(_, errs += _)))
      }
      val mappings = arr(n, "column_mappings").map { m =>
        ColumnMapping(
          sourceColumn = str(m, "source_column").getOrElse { errs += "column_mapping.source_column is required"; "" },
          endpointParam = str(m, "endpoint_param"),
          transform = str(m, "transform"))
      }
      sink.map(k => TablesConfig(source, k, mappings))
    }

    val execution = Option(root.get("execution")).map { n =>
      ExecutionConfig(
        numPartitions = int(n, "num_partitions").getOrElse(200),
        batchSize = int(n, "batch_size").map(_.toLong).getOrElse(10000L),
        maxAttempts = int(n, "max_attempts").getOrElse(5),
        maxConcurrentRequests = int(n, "max_concurrent_requests").getOrElse(20),
        maxRequestsPerSecond = dbl(n, "max_requests_per_second"))
    }.getOrElse(ExecutionConfig())

    val collected = errs.result()
    if (collected.nonEmpty) throw ConfigValidationException(collected)
    val cfg = PipelineConfig(endpoint.get, transport, auth, middleware, tables.get, execution)
    cfg.validate()
    cfg
  }

  private def decodeTransport(n: JsonNode): TransportConfig = {
    val tcp = Option(n.get("tcp_connection")).map { t =>
      val tls = Option(t.get("tls")).map { x =>
        TlsConfig(
          verify = bool(x, "verify").getOrElse(true),
          caBundle = str(x, "ca_bundle"),
          clientCert = str(x, "client_cert"),
          clientKey = str(x, "client_key"))
      }.getOrElse(TlsConfig())
      TcpConnectionConfig(
        limit = int(t, "limit").getOrElse(100),
        limitPerHost = int(t, "limit_per_host").getOrElse(0),
        ttlDnsCacheSeconds = int(t, "ttl_dns_cache").getOrElse(300),
        forceClose = bool(t, "force_close").getOrElse(false),
        tls = tls)
    }.getOrElse(TcpConnectionConfig())
    TransportConfig(
      transportType = str(n, "type").getOrElse("jdk-http"),
      baseTimeoutSeconds = dbl(n, "base_timeout").getOrElse(30.0),
      warmupTimeoutSeconds = dbl(n, "warmup_timeout").getOrElse(10.0),
      tcpConnection = tcp,
      diagnostics = bool(n, "diagnostics").getOrElse(true),
      retryNonIdempotent = bool(n, "retry_non_idempotent").getOrElse(false))
  }

  private def decodeAuth(n: JsonNode, err: String => Unit): AuthConfig =
    str(n, "type").getOrElse("none") match {
      case "none"  => NoAuth
      case "basic" =>
        BasicAuth(
          str(n, "username").getOrElse { err("auth.basic.username is required"); "" },
          str(n, "password").getOrElse { err("auth.basic.password is required"); "" })
      case "bearer" =>
        BearerAuth(str(n, "token").getOrElse { err("auth.bearer.token is required"); "" })
      case "oauth2_password" =>
        OAuth2PasswordAuth(
          str(n, "token_url").getOrElse { err("auth.oauth2_password.token_url is required"); "" },
          str(n, "client_id").getOrElse { err("auth.oauth2_password.client_id is required"); "" },
          str(n, "client_secret").getOrElse(""),
          str(n, "username").getOrElse { err("auth.oauth2_password.username is required"); "" },
          str(n, "password").getOrElse { err("auth.oauth2_password.password is required"); "" },
          int(n, "refresh_margin").map(_.toLong).getOrElse(60L))
      case "oauth2_client_credentials" =>
        OAuth2ClientCredentialsAuth(
          str(n, "token_url").getOrElse { err("auth.oauth2_client_credentials.token_url is required"); "" },
          str(n, "client_id").getOrElse { err("auth.oauth2_client_credentials.client_id is required"); "" },
          str(n, "client_secret").getOrElse { err("auth.oauth2_client_credentials.client_secret is required"); "" },
          int(n, "refresh_margin").map(_.toLong).getOrElse(60L))
      case other => err(s"unknown auth.type '$other'"); NoAuth
    }

  private def decodeMiddleware(n: JsonNode, err: String => Unit): Option[MiddlewareConfig] = {
    // params may be nested under "params" or inline (both appear in reference configs)
    val p = Option(n.get("params")).filterNot(_.isNull).getOrElse(n)
    str(n, "type") match {
      case Some("retry") => Some(RetryConfig(
        maxAttempts = int(p, "max_attempts").getOrElse(10),
        retryStatusCodes = intSeq(p, "retry_status_codes").map(_.toSet).getOrElse(Set(500, 502, 503, 504, 429)),
        baseDelaySeconds = dbl(p, "base_delay").getOrElse(0.1),
        maxDelaySeconds = dbl(p, "max_delay").getOrElse(2.0)))
      case Some("json_body")   => Some(JsonBodyConfig)
      case Some("logging")     => Some(LoggingConfig)
      case Some("timing")      => Some(TimingConfig)
      case Some("worker_diag") => Some(WorkerDiagConfig)
      case Some("bearer") => Some(StaticBearerConfig(
        str(p, "token").getOrElse { err("middleware.bearer.token is required"); "" }))
      case Some("header") => Some(HeaderAuthConfig(
        str(p, "username").getOrElse { err("middleware.header.username is required"); "" },
        str(p, "password").getOrElse { err("middleware.header.password is required"); "" }))
      case Some(other) => err(s"unknown middleware.type '$other'"); None
      case None        => err("middleware entry missing 'type'"); None
    }
  }

  private def decodeColumnSpec(n: JsonNode, err: String => Unit): ColumnSpec =
    ColumnSpec(
      name = str(n, "name").getOrElse { err("schema column missing name"); "" },
      dataType = str(n, "type").getOrElse { err("schema column missing type"); "string" },
      nullable = bool(n, "nullable").getOrElse(true),
      description = str(n, "description"),
      elementType = str(n, "element_type"),
      keyType = str(n, "key_type"),
      valueType = str(n, "value_type"))
}
