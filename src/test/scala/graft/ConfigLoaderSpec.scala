package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.config._

/** Config loading + validation — mirrors the reference's tests/unit/config
  * suite (every Pydantic rule cited in SURVEY.md §1.4/§2.E).
  */
class ConfigLoaderSpec extends AnyFunSuite with Matchers {

  private val minimalJson =
    """{
      "endpoint": {"name": "e", "base_url": "http://localhost:1234", "url_path": "/api/data",
                   "method": "GET", "vendor": "test_vendor"},
      "auth": {"type": "none"},
      "middleware": [{"type": "logging"}, {"type": "timing"}, {"type": "json_body"},
                     {"type": "retry", "max_attempts": 4, "base_delay": 0.2}],
      "tables": {"sink": {"name": "bronze", "namespace": "demo", "mode": "append"},
                 "column_mappings": [{"source_column": "o_custkey", "endpoint_param": "customer"}]},
      "execution": {"num_partitions": 4, "batch_size": 100, "max_attempts": 2,
                    "max_concurrent_requests": 8}
    }"""

  test("JSON config decodes with defaults and nested sections") {
    val cfg = ConfigLoader.fromJsonString(minimalJson)
    cfg.endpoint.resolvedUrl shouldBe "http://localhost:1234/api/data"
    cfg.transport.baseTimeoutSeconds shouldBe 30.0
    cfg.transport.tcpConnection.limit shouldBe 100
    cfg.auth shouldBe NoAuth
    cfg.middleware should have size 4
    cfg.middleware(3) shouldBe RetryConfig(maxAttempts = 4, baseDelaySeconds = 0.2)
    cfg.tables.requestMapping shouldBe Map("customer" -> "o_custkey")
    cfg.execution.maxConcurrentRequests shouldBe 8
  }

  test("transport.retry_non_idempotent and sink.redact_headers decode (default off)") {
    val cfg0 = ConfigLoader.fromJsonString(minimalJson)
    cfg0.transport.retryNonIdempotent shouldBe false
    cfg0.tables.sink.redactHeaders shouldBe empty
    val cfg = ConfigLoader.fromJsonString(minimalJson
      .replace(""""auth"""", """"transport": {"retry_non_idempotent": true}, "auth"""")
      .replace(""""mode": "append"""", """"mode": "append", "redact_headers": ["Authorization"]"""))
    cfg.transport.retryNonIdempotent shouldBe true
    cfg.tables.sink.redactHeaders shouldBe Seq("Authorization")
  }

  test("endpoint.response_schema decodes and invalid DDL is a validation error") {
    val cfg = ConfigLoader.fromJsonString(minimalJson.replace(
      """"vendor": "test_vendor"""",
      """"vendor": "test_vendor", "response_schema": "id STRING, n INT""""))
    cfg.endpoint.responseSchema shouldBe Some("id STRING, n INT")
    a[ConfigValidationException] should be thrownBy ConfigLoader.fromJsonString(
      minimalJson.replace(
        """"vendor": "test_vendor"""",
        """"vendor": "test_vendor", "response_schema": "id NOTATYPE((""""))
  }

  test("YAML config decodes identically (loader.py:25-59)") {
    val yaml =
      """endpoint:
        |  name: e
        |  base_url: http://localhost:1234
        |  url_path: /api/data
        |auth:
        |  type: basic
        |  username: u
        |  password: p
        |middleware:
        |  - type: retry
        |    params:
        |      max_attempts: 7
        |tables:
        |  sink:
        |    name: bronze
        |    namespace: demo
        |""".stripMargin
    val cfg = ConfigLoader.fromYamlString(yaml)
    cfg.auth shouldBe BasicAuth("u", "p")
    cfg.middleware.head shouldBe RetryConfig(maxAttempts = 7)
  }

  test("env substitution resolves {{env.NAME}} before validation (preprocessor.py:36-64)") {
    val cfg = ConfigLoader.decode(graft.util.Json.parse(
      ConfigLoader.preprocess(minimalJson.replace("test_vendor", "{{env.VENDOR}}"),
        Map("VENDOR" -> "acme").get)))
    cfg.endpoint.vendor shouldBe Some("acme")
  }

  test("secret substitution resolves {{secret.SCOPE:KEY}} via the pluggable resolver") {
    ConfigLoader.preprocess("""{"pw": "{{secret.prod:db_pass}}"}""",
      secrets = (s, k) => Some(s"$s/$k")) shouldBe """{"pw": "prod/db_pass"}"""
    a[ConfigValidationException] should be thrownBy
      ConfigLoader.preprocess("""{"pw": "{{secret.prod:nope}}"}""", secrets = (_, _) => None)
  }

  test("unresolved env var fails validation") {
    a[ConfigValidationException] should be thrownBy
      ConfigLoader.preprocess("""{"x": "{{env.MISSING_XYZ}}"}""", _ => None)
  }

  test("missing required sections collect errors") {
    val e = intercept[ConfigValidationException](ConfigLoader.fromJsonString("""{"endpoint": {}}"""))
    e.errors.exists(_.contains("endpoint.name")) shouldBe true
    e.errors.exists(_.contains("tables")) shouldBe true
  }

  test("invalid method / mode / transform rejected") {
    val bad = minimalJson.replace("\"GET\"", "\"FETCH\"")
    intercept[ConfigValidationException](ConfigLoader.fromJsonString(bad))
  }

  test("auth discriminated union decodes every variant (auth.py:74-82)") {
    def auth(json: String): AuthConfig =
      ConfigLoader.fromJsonString(minimalJson.replace("""{"type": "none"}""", json)).auth
    auth("""{"type": "bearer", "token": "t"}""") shouldBe BearerAuth("t")
    auth("""{"type": "oauth2_password", "token_url": "http://k/t", "client_id": "c",
            "client_secret": "s", "username": "u", "password": "p"}""") shouldBe
      OAuth2PasswordAuth("http://k/t", "c", "s", "u", "p")
    auth("""{"type": "oauth2_client_credentials", "token_url": "http://k/t",
            "client_id": "c", "client_secret": "s", "refresh_margin": 30}""") shouldBe
      OAuth2ClientCredentialsAuth("http://k/t", "c", "s", 30)
  }

  test("config type system maps to Spark types; struct unsupported (data_contract.py:110-152)") {
    import org.apache.spark.sql.types._
    ColumnSpec("a", "string").toStructField.dataType shouldBe StringType
    ColumnSpec("a", "array", elementType = Some("integer")).toStructField.dataType shouldBe
      ArrayType(IntegerType, containsNull = true)
    ColumnSpec("a", "map", keyType = Some("string"), valueType = Some("double"))
      .toStructField.dataType shouldBe MapType(StringType, DoubleType, valueContainsNull = true)
    a[ConfigValidationException] should be thrownBy ColumnSpec("a", "struct").toStructField
    a[ConfigValidationException] should be thrownBy ColumnSpec("a", "array").toStructField
  }

  test("source validation: required ⊆ columns, schema ⊆ columns, extras warn (data_contract.py:215-241)") {
    val src = SourceTableConfig("t", "db", idColumn = "id",
      requiredColumns = Seq("a"), schema = Seq(ColumnSpec("b", "string")))
    val (ok1, errs1, _) = src.validateColumns(Seq("id", "a", "b"))
    ok1 shouldBe true
    val (ok2, errs2, _) = src.validateColumns(Seq("a", "b"))
    ok2 shouldBe false
    errs2.exists(_.contains("'id'")) shouldBe true
    val (_, _, warns) = src.validateColumns(Seq("id", "a", "b", "zzz"))
    warns.exists(_.contains("zzz")) shouldBe true
  }

  test("every example config in configs/examples parses and validates") {
    val dir = new java.io.File("configs/examples")
    val files = dir.listFiles().filter(_.getName.endsWith(".yml"))
    files should not be empty
    files.foreach { f =>
      val text = java.nio.file.Files.readString(f.toPath)
      // any {{env.X}} / {{secret.S:K}} placeholder resolves to a dummy
      val cfg = ConfigLoader.fromYamlString(text, _ => Some("dummy"), (_, _) => Some("dummy"))
      withClue(f.getName) { cfg.endpoint.name should not be empty }
    }
  }

  test("request_template accepts dict form and renders canonical JSON") {
    val cfg = ConfigLoader.fromYamlString(
      """endpoint:
        |  name: t
        |  base_url: http://x
        |  method: POST
        |  request_template:
        |    order: "{{request_id}}"
        |tables:
        |  sink: {name: s, namespace: db}
        |""".stripMargin)
    cfg.endpoint.requestTemplate shouldBe Some("""{"order":"{{request_id}}"}""")
  }

  test("sink partition_by must be bronze columns (data_contract.py:273-288)") {
    SinkTableConfig("t", "db", partitionBy = Seq("status_code")).validate shouldBe empty
    SinkTableConfig("t", "db", partitionBy = Seq("nope")).validate should not be empty
  }
}
