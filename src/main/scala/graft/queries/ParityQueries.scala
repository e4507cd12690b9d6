package graft.queries

import org.apache.spark.sql.functions._

import graft.config._
import graft.model.BronzeSchema
import graft.queries.QueryDef.tbl

/** SURVEY.md §2.A relational/dataflow operator parity, one oracle-checked
  * query per operator row, driven off the deterministic testdata tables.
  */
object ParityQueries {

  val all: Seq[QueryDef] = Seq(

    // Table scan + projection (orchestrator.py:164-174): the scan should
    // prune to exactly the projected columns (ReadSchema in explain).
    QueryDef("p01_table_scan",
      (s, d) => tbl(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Rename/projection to the request contract (orchestrator.py:211-212).
    QueryDef("p02_rename_projection",
      (s, d) => tbl(s, d, "orders")
        .withColumnRenamed("o_orderkey", "request_id")
        .select("request_id", "o_custkey")
        .orderBy("request_id"),
      Some("SELECT o_orderkey AS request_id, o_custkey FROM orders ORDER BY request_id")),

    // Synthetic source generation (run_demo_pipeline.py:60-66) —
    // deterministic variant: sha2 of the range id instead of uuid().
    QueryDef("p03_synthetic_source",
      (s, _) => s.range(1000)
        .select(col("id"), sha2(col("id").cast("string"), 256).as("tracking_id"))
        .orderBy("id"),
      Some("""SELECT id, sha256(id::VARCHAR) AS tracking_id
             |FROM (SELECT range::BIGINT AS id FROM range(1000)) ORDER BY id""".stripMargin)),

    // Source projection validation (data_contract.py:215-241): the
    // validation report itself as a result set.
    QueryDef("p04_source_validation", (s, d) => {
      import s.implicits._
      val contract = SourceTableConfig("orders", "demo", idColumn = "o_orderkey",
        requiredColumns = Seq("o_custkey", "missing_col"),
        schema = Seq(ColumnSpec("o_totalprice", "double"), ColumnSpec("bogus_col", "string")))
      val (ok, errs, _) = contract.validateColumns(tbl(s, d, "orders").columns.toSeq)
      (errs.map(("error", _)) :+ (("valid", ok.toString)))
        .toDF("kind", "detail").orderBy("kind", "detail")
    },
      Some("""SELECT * FROM (VALUES
             |  ('error', 'Required column ''missing_col'' not found in source'),
             |  ('error', 'Schema column ''bogus_col'' not found in source'),
             |  ('valid', 'false')) AS t(kind, detail) ORDER BY kind, detail""".stripMargin)),

    // THE idempotency operator: left anti join of source against sink
    // (batch_processor.py:36-40). Sink simulated as every 3rd order done.
    QueryDef("p05_anti_join", (s, d) => {
      val source = tbl(s, d, "orders")
        .select(col("o_orderkey").cast("string").as("request_id"))
      val sink = tbl(s, d, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").cast("string").as("request_id"))
      source.join(sink, Seq("request_id"), "left_anti").orderBy("request_id")
    },
      Some("""SELECT o_orderkey::VARCHAR AS request_id FROM orders
             |WHERE o_orderkey % 3 <> 0 ORDER BY request_id""".stripMargin)),

    // Count of remaining rows (batch_processor.py:44).
    QueryDef("p06_count_remaining", (s, d) => {
      val source = tbl(s, d, "orders").select(col("o_orderkey").cast("string").as("request_id"))
      val sink = tbl(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").cast("string").as("request_id"))
      source.join(sink, Seq("request_id"), "left_anti")
        .agg(count(lit(1)).as("remaining"))
    },
      Some("SELECT count(*) AS remaining FROM orders WHERE o_orderkey % 3 <> 0")),

    // Engine-internal hash batching (batch_processor.py:42-54):
    // pmod(murmur3) has no DuckDB twin → rows-only check. Asserts the
    // partition-of-unity property (counts per batch sum to the total).
    // Batch assignment through the real operator in its portable-hash mode
    // (md5-56bit ↔ DuckDB twin) so the gate checks the exact assignment;
    // the default murmur3 mode (reference parity) is covered by unit tests.
    QueryDef("p07_batch_assignment_hash",
      (s, d) => tbl(s, d, "orders")
        .select(col("o_orderkey").cast("string").as("request_id"))
        .withColumn("batch_id",
          graft.orchestration.BatchProcessor.portableBatchId(col("request_id"), 6))
        .groupBy("batch_id").agg(count(lit(1)).as("rows"))
        .orderBy("batch_id"),
      Some("""SELECT ('0x'||substr(md5(o_orderkey::VARCHAR),1,14))::BIGINT % 6 AS batch_id,
             |  count(*) AS rows
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Portable batching twin (modulo on the key) — oracle-checked shape of
    // the same operator: assignment, per-batch stats, pmod sign fix (Q8).
    QueryDef("p08_batch_assignment_mod",
      (s, d) => tbl(s, d, "orders")
        .withColumn("batch_id", pmod(col("o_orderkey"), lit(6)))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("rows"), min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
        .orderBy("batch_id"),
      Some("""SELECT o_orderkey % 6 AS batch_id, count(*) AS rows,
             |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Batch predicate filter (batch_processor.py:56-57).
    QueryDef("p09_batch_filter",
      (s, d) => tbl(s, d, "orders")
        .withColumn("batch_id", pmod(col("o_orderkey"), lit(6)))
        .filter(col("batch_id") === 0)
        .select("o_orderkey").orderBy("o_orderkey"),
      Some("SELECT o_orderkey FROM orders WHERE o_orderkey % 6 = 0 ORDER BY o_orderkey")),

    // The fixed bronze contract (bronze.py:12-125, typed per Q1/Q2).
    QueryDef("p10_bronze_schema", (s, _) => {
      import s.implicits._
      BronzeSchema.schema.fields.zipWithIndex.map { case (f, i) =>
        (i + 1, f.name, f.dataType.sql, f.nullable)
      }.toSeq.toDF("ordinal", "name", "sql_type", "nullable").orderBy("ordinal")
    },
      Some("""SELECT * FROM (VALUES
             |  (1,'request_id','STRING',false), (2,'row_hash','STRING',true),
             |  (3,'url','STRING',false), (4,'method','STRING',false),
             |  (5,'request_headers','STRING',true), (6,'request_params','STRING',true),
             |  (7,'request_metadata','STRING',true), (8,'status_code','INT',true),
             |  (9,'response_headers','STRING',true), (10,'body_text','STRING',true),
             |  (11,'success','BOOLEAN',true), (12,'error_message','STRING',true),
             |  (13,'attempts','INT',true), (14,'response_metadata','STRING',true),
             |  (15,'_request_time','TIMESTAMP',false))
             |AS t(ordinal, name, sql_type, nullable) ORDER BY ordinal""".stripMargin)),

    // Config surface decode (loader.py + every model default in §2.E).
    QueryDef("p11_config_decode", (s, _) => {
      import s.implicits._
      val cfg = ConfigLoader.fromJsonString(
        """{"endpoint": {"name": "demo", "base_url": "http://api.example.com",
          |              "url_path": "patients", "method": "post"},
          | "auth": {"type": "basic", "username": "u", "password": "p"},
          | "middleware": [{"type": "retry"}, {"type": "json_body"}],
          | "tables": {"sink": {"name": "bronze", "namespace": "demo"},
          |            "column_mappings": [{"source_column": "patient_id",
          |                                 "endpoint_param": "patient"}]},
          | "execution": {}}""".stripMargin)
      val retry = cfg.middleware.head.asInstanceOf[RetryConfig]
      Seq(
        ("endpoint.resolved_url", cfg.endpoint.resolvedUrl),
        ("endpoint.method", cfg.endpoint.method),
        ("auth.type", cfg.auth.authType),
        ("middleware.count", cfg.middleware.size.toString),
        ("retry.max_attempts", retry.maxAttempts.toString),
        ("retry.status_codes", retry.retryStatusCodes.toSeq.sorted.mkString(",")),
        ("mapping.patient", cfg.tables.requestMapping("patient")),
        ("execution.num_partitions", cfg.execution.numPartitions.toString),
        ("execution.batch_size", cfg.execution.batchSize.toString),
        ("execution.max_attempts", cfg.execution.maxAttempts.toString),
        ("execution.max_concurrent_requests", cfg.execution.maxConcurrentRequests.toString),
        ("sink.identifier", cfg.tables.sink.identifier),
        ("sink.mode", cfg.tables.sink.mode)
      ).toDF("key", "value").orderBy("key")
    },
      Some("""SELECT * FROM (VALUES
             |  ('auth.type', 'basic'),
             |  ('endpoint.method', 'POST'),
             |  ('endpoint.resolved_url', 'http://api.example.com/patients'),
             |  ('execution.batch_size', '10000'),
             |  ('execution.max_attempts', '5'),
             |  ('execution.max_concurrent_requests', '20'),
             |  ('execution.num_partitions', '200'),
             |  ('mapping.patient', 'patient_id'),
             |  ('middleware.count', '2'),
             |  ('retry.max_attempts', '10'),
             |  ('retry.status_codes', '429,500,502,503,504'),
             |  ('sink.identifier', 'demo.bronze'),
             |  ('sink.mode', 'append')) AS t(key, value) ORDER BY key""".stripMargin)),

    // Column-mapping transforms upper/lower/strip (quirk Q3, implemented).
    QueryDef("p12_column_transforms",
      (s, d) => tbl(s, d, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lower(col("c_mktsegment")).as("segment_lower"),
          trim(concat(lit("  "), col("c_name"), lit("  "))).as("name_stripped"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS name_upper,
             |  lower(c_mktsegment) AS segment_lower,
             |  trim('  ' || c_name || '  ') AS name_stripped
             |FROM customer ORDER BY c_custkey""".stripMargin))
  )
}
