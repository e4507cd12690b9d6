package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Ingest

/** Behavioral tests for the JSONL quarantine ingest (x118): all three
  * triage classes (valid / malformed / missing_id), raw-byte preservation
  * on the quarantine side, and the map-only plan shape.
  */
class IngestSpec extends SparkSpec with Matchers {

  private val ddl = "doc_id BIGINT, text STRING"

  private def stage(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-spec")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("triage: valid parses typed, malformed and missing_id quarantine with reasons") {
    val dir = stage(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "truncated""", // malformed (unclosed)
      """{"text": "no primary key"}""", // missing_id
      "", // blank — dropped, not quarantined
      """{"doc_id": 3, "text": "quote \" and backslash \\ round trip"}""")
    val (valid, quarantine) = Ingest.jsonlWithQuarantine(spark, dir, ddl, "doc_id")
    val v = valid.orderBy("doc_id").collect()
    v.map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L)
    v(1).getString(1) shouldBe "quote \" and backslash \\ round trip"
    val q = quarantine.orderBy("reason").collect()
    q.map(_.getString(1)).toSeq shouldBe Seq("malformed", "missing_id")
    // raw bytes preserved untouched for forensics/re-crawl
    q(0).getString(0) shouldBe """{"doc_id": 2, "text": "truncated"""
    q(1).getString(0) shouldBe """{"text": "no primary key"}"""
  }

  test("CSV triage: column-count and type damage quarantine; quote damage is salvaged (pinned)") {
    val dir = stage(
      "1,hello world",
      "2", // too few columns -> malformed
      ",keyless text", // empty key field -> missing_id
      "x,not a number", // type error in doc_id -> malformed
      """5,"unclosed quote""") // CSV caveat: parser salvages this as VALID
    val (valid, quarantine) = Ingest.csvWithQuarantine(spark, dir, ddl, "doc_id")
    valid.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq shouldBe Seq((1L, "hello world"), (5L, "unclosed quote"))
    quarantine.orderBy("reason", "raw_line").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq shouldBe Seq(
      ("2", "malformed"), ("x,not a number", "malformed"),
      (",keyless text", "missing_id"))
  }

  test("idField must exist in the schema; 'batch' is reserved for the sink layout") {
    an[IllegalArgumentException] should be thrownBy
      Ingest.jsonlWithQuarantine(spark, "/tmp/nowhere", ddl, "id")
    an[IllegalArgumentException] should be thrownBy
      Ingest.jsonlWithQuarantine(spark, "/tmp/nowhere",
        "batch BIGINT, doc_id BIGINT, text STRING", "doc_id")
  }

  test("both branches are map-only: no exchange on either side") {
    val dir = stage("""{"doc_id": 1, "text": "a"}""")
    val (valid, quarantine) = Ingest.jsonlWithQuarantine(spark, dir, ddl, "doc_id")
    for (df <- Seq(valid, quarantine)) {
      val plan = df.queryExecution.executedPlan.toString
      (plan should not).include("Exchange")
      (plan should not).include("ShuffleExchange")
    }
  }

  test("streaming quarantine drain matches the batch split and fills both sinks") {
    val dir = stage(
      """{"doc_id": 1, "text": "one"}""",
      """{"doc_id": 2, "text": "broke""",
      """{"text": "keyless"}""",
      """{"doc_id": 3, "text": "three"}""")
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-stream").toString
    val (valid, quarantine) = Ingest.jsonlStreamWithQuarantine(
      spark, dir, ddl, "doc_id", out)
    valid.orderBy("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L)
    val (bv, bq) = Ingest.jsonlWithQuarantine(spark, dir, ddl, "doc_id")
    valid.orderBy("doc_id").collect().toSeq shouldBe bv.orderBy("doc_id").collect().toSeq
    quarantine.orderBy("reason").collect().toSeq shouldBe bq.orderBy("reason").collect().toSeq
    // RESUME against the SAME outRoot: the checkpoint marks the backlog
    // processed, so nothing re-appends AND the existing sink data
    // survives (exactly-once, no wipe-on-reentry)
    val (valid2, quarantine2) = Ingest.jsonlStreamWithQuarantine(
      spark, dir, ddl, "doc_id", out)
    valid2.orderBy("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L)
    quarantine2.count() shouldBe 2L
  }

  test("x118 planted damage routes exactly the two corrupt classes to quarantine") {
    // Drive the full query's staging contract at sf0.001: quarantine
    // reasons must split 50-aligned (malformed) vs 25-aligned (missing_id)
    // and the valid side must carry everything else.
    val d = sfDir
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val total = docs.count()
    val expMalformed = docs.filter(col("doc_id") % 50 === 0).count()
    val expMissing = docs.filter(col("doc_id") % 50 === 25).count()
    val out = SparkEntry.queries("x118_jsonl_quarantine")(spark, d)
    out.count() shouldBe (total - expMalformed - expMissing)
  }
}
