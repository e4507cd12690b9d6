package graft.model

import java.security.MessageDigest
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.util.Json

/** The fixed 15-column bronze response envelope.
  * Ref: src/core/bronze.py:12-125 (SURVEY.md §1.3).
  *
  * Deliberate divergences from the reference (quirk register):
  *  - Q1: the field is named `body_text` everywhere (the reference's row
  *    builder emits `json_body` and relies on positional alignment).
  *  - Q2: honest types — status_code INT, success BOOLEAN, attempts INT
  *    (the reference stores stringified ints/bools in string columns).
  */
object BronzeSchema {
  private def meta(comment: String, pk: Boolean = false): Metadata = {
    val b = new MetadataBuilder().putString("comment", comment)
    if (pk) b.putBoolean("primary_key", true)
    b.build()
  }

  val schema: StructType = StructType(Seq(
    StructField("request_id", StringType, nullable = false,
      meta("Unique request identifier from the source id column", pk = true)),
    StructField("row_hash", StringType, nullable = true,
      meta("SHA-256 hash of the response body")),
    StructField("url", StringType, nullable = false,
      meta("Endpoint URL the request was sent to")),
    StructField("method", StringType, nullable = false,
      meta("HTTP method")),
    StructField("request_headers", StringType, nullable = true,
      meta("JSON-serialized request headers")),
    StructField("request_params", StringType, nullable = true,
      meta("JSON-serialized query parameters")),
    StructField("request_metadata", StringType, nullable = true,
      meta("JSON-serialized request-side metadata (vendor, ...)")),
    StructField("status_code", IntegerType, nullable = true,
      meta("HTTP status code (typed; reference stores string)")),
    StructField("response_headers", StringType, nullable = true,
      meta("JSON-serialized response headers")),
    StructField("body_text", StringType, nullable = true,
      meta("Response body text")),
    StructField("success", BooleanType, nullable = true,
      meta("Semantic success flag (typed; reference stores string)")),
    StructField("error_message", StringType, nullable = true,
      meta("Failure description when success = false")),
    StructField("attempts", IntegerType, nullable = true,
      meta("Number of send attempts (typed; reference stores string)")),
    StructField("response_metadata", StringType, nullable = true,
      meta("JSON-serialized middleware metadata (timing, logs, warmup, executor identity)")),
    StructField("_request_time", TimestampType, nullable = false,
      meta("Request completion time"))
  ))

  val columns: Seq[String] = schema.fields.map(_.name).toSeq

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Build one bronze Row from a finished exchange.
    * Ref: RequestExchange.build_row, src/request_execution/models.py:96-122.
    *
    * `redactHeaders` (case-insensitive names, from sink.redact_headers)
    * masks credential-bearing request headers before they are persisted —
    * opt-in divergence from the reference, which stores Authorization
    * values verbatim in the sink table.
    */
  def buildRow(requestId: String, ex: RequestExchange,
      redactHeaders: Set[String] = Set.empty): Row = {
    val req = ex.request
    val resp = ex.response
    val bodyBytes = resp.map(_.body).getOrElse(Array.emptyByteArray)
    val redactLower = redactHeaders.map(_.toLowerCase)
    def mask(h: Map[String, String]): Map[String, String] =
      if (redactLower.isEmpty) h
      else h.map { case (k, v) =>
        k -> (if (redactLower.contains(k.toLowerCase)) "***redacted***" else v)
      }
    Row(
      requestId,
      if (bodyBytes.nonEmpty) sha256Hex(bodyBytes) else null,
      req.map(_.url).getOrElse(ex.context.url),
      req.map(_.method).getOrElse(ex.context.method),
      req.map(r => Json.write(mask(r.headers))).orNull,
      req.map(r => Json.write(r.params)).orNull,
      if (ex.context.metadata.nonEmpty) Json.write(ex.context.metadata) else null,
      ex.statusCode.map(Int.box).orNull,
      resp.map(r => Json.write(r.headers)).orNull,
      ex.bodyText.orNull,
      ex.success.map(Boolean.box).orNull,
      ex.errorMessage.orNull,
      Int.box(ex.attempts),
      if (ex.metadata.nonEmpty) Json.write(ex.metadata) else null,
      new Timestamp(System.currentTimeMillis())
    )
  }
}
