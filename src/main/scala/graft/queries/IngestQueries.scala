package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Portable.hash56
import graft.operators.Ingest
import graft.queries.ExtensionQueries.{dkHash56, idxScratch}
import graft.queries.QueryDef.tbl

/** Raw-format ingestion queries: JSONL with corrupt-line quarantine
  * (x118). The query stages a JSONL rendering of the documents table with
  * DETERMINISTICALLY planted damage — every doc_id ≡ 0 (mod 50) line
  * truncated mid-string (malformed), every doc_id ≡ 25 (mod 50) line
  * written without its primary key (missing_id) — then ingests it back
  * through the quarantine split. The oracle knows exactly which ids must
  * survive, and the per-doc text hash proves the typed round trip through
  * JSON escaping is byte-exact; a corrupt line leaking into the valid
  * side would hash-mismatch, a valid line mis-quarantined would
  * row-count-mismatch.
  */
object IngestQueries {

  private val docSchemaDdl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** Build-once-per-(JVM, sf-dir, format) damaged-file staging (the
    * idxScratch pattern): repeated Verify/Bench evaluations reuse the
    * rendered files rather than re-writing them per invocation. `render`
    * produces the one-line-per-doc `value` column for the format.
    */
  private val stagedDirs = scala.collection.mutable.Set[String]()
  private def stageOnce(s: org.apache.spark.sql.SparkSession, d: String,
      prefix: String)(
      render: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column): String =
    stagedDirs.synchronized {
      val dir = s"$idxScratch/${prefix}_${Integer.toHexString(d.hashCode)}"
      if (!stagedDirs(dir)) {
        val docs = tbl(s, d, "documents")
        docs.select(render(docs).as("value"))
          .write.mode("overwrite").text(dir)
        stagedDirs += dir
      }
      dir
    }

  private def jsonlDirFor(s: org.apache.spark.sql.SparkSession,
      d: String): String = stageOnce(s, d, "jsonl") { docs =>
    val full = to_json(struct(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")))
    val noId = to_json(struct(col("text"), col("lang"),
      col("source"), col("n_chars")))
    when(col("doc_id") % 50 === 0, substring(full, 1, 20))
      .when(col("doc_id") % 50 === 25, noId)
      .otherwise(full)
  }

  /** Damaged-CSV staging twin of [[jsonlDirFor]]: headerless positional
    * CSV; doc_id ≡ 0 (mod 50) rows truncate to the bare id (too few
    * columns → the parser's corrupt channel fires), doc_id ≡ 25 rows
    * render with an EMPTY key field (parses clean, id null).
    *
    * Unlike to_json, the CSV line rendering is NOT byte-safe for every
    * text: a newline splits the record across read.text lines, to_csv's
    * write-side whitespace trimming drops leading/trailing spaces, and
    * the parser's embedded-quote handling is dialect-bound — so staging
    * SCANS the corpus once and fails loudly if any text carries those
    * characters, instead of shipping a silent oracle mismatch.
    */
  private def csvDirFor(s: org.apache.spark.sql.SparkSession,
      d: String): String = stageOnce(s, d, "csv") { docs =>
    val hostile = docs.filter(
      col("text").rlike("[\\n\\r\"]") || col("text") =!= trim(col("text")))
      .count()
    require(hostile == 0L,
      s"x123 CSV staging: $hostile document(s) contain newlines, quotes, " +
        "or leading/trailing whitespace — the CSV line round trip is not " +
        "byte-safe for them (the JSONL twin is); regenerate or filter")
    val full = to_csv(struct(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")))
    val noId = to_csv(struct(lit(null).cast("bigint").as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars")))
    when(col("doc_id") % 50 === 0, col("doc_id").cast("string"))
      .when(col("doc_id") % 50 === 25, noId)
      .otherwise(full)
  }

  val all: Seq[QueryDef] = Seq(

    // JSONL quarantine ingest (x118): the valid-side typed round trip.
    // Map-only split (text scan + from_json, no shuffle either branch);
    // the quarantine side's reason triage is pinned in IngestSpec.
    QueryDef("x118_jsonl_quarantine",
      (s, d) => {
        val (valid, _) = Ingest.jsonlWithQuarantine(s, jsonlDirFor(s, d),
          docSchemaDdl, "doc_id")
        valid.select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"), hash56(col("text")).as("h"))
          .orderBy("doc_id")
      },
      Some(jsonlValidOracle)),

    // Streaming JSONL quarantine ingest (x121): the same damaged files
    // drained as a STREAM — per-micro-batch triage, dual parquet sinks,
    // checkpointed exactly-once append (the crawl-firehose shape). Same
    // oracle as x118: the streamed valid channel must be byte-identical
    // to the batch split.
    QueryDef("x121_jsonl_stream_quarantine",
      (s, d) => {
        // outRoot lives under idxScratch (one per JVM+sf-dir, shutdown-
        // hook cleaned): the first evaluation drains the backlog, later
        // ones resume against the checkpoint and read the same sinks —
        // the deployment contract, and no per-invocation /tmp leak.
        val outRoot = s"$idxScratch/x121_${Integer.toHexString(d.hashCode)}"
        val (valid, _) = Ingest.jsonlStreamWithQuarantine(s,
          jsonlDirFor(s, d), docSchemaDdl, "doc_id", outRoot)
        valid.select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"), hash56(col("text")).as("h"))
          .orderBy("doc_id")
      },
      Some(jsonlValidOracle)),

    // CSV quarantine ingest (x123): the same planted-damage contract
    // over headerless positional CSV — truncated records (too few
    // columns) hit the parser's corrupt channel, keyless rows parse
    // clean into missing_id. Same oracle: the valid channel must carry
    // exactly the undamaged ids with byte-exact text.
    QueryDef("x123_csv_quarantine",
      (s, d) => {
        val (valid, _) = Ingest.csvWithQuarantine(s, csvDirFor(s, d),
          docSchemaDdl, "doc_id")
        valid.select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"), hash56(col("text")).as("h"))
          .orderBy("doc_id")
      },
      Some(jsonlValidOracle))
  )

  // lazy: referenced from `all`, which initializes first
  private lazy val jsonlValidOracle: String =
    s"""SELECT doc_id, source, lang, n_chars,
       |  ${dkHash56("text")} AS h
       |FROM documents
       |WHERE doc_id % 50 <> 0 AND doc_id % 50 <> 25
       |ORDER BY doc_id""".stripMargin
}
