package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives shared by the dedup/similarity/
  * text operators. Everything here compiles to built-in Catalyst
  * expressions (whole-stage codegen, no UDFs) AND has an exact ANSI-SQL
  * twin runnable by DuckDB — that twin is what the oracle queries in
  * SparkEntry.oracleSql use, so results hash-match bit for bit.
  */
object Portable {
  /** 56-bit deterministic string hash: first 14 hex digits of md5, as a
    * non-negative BIGINT. Portable twin:
    * DuckDB `('0x' || substr(md5(s), 1, 14))::BIGINT`.
    * (We avoid Spark's murmur3 `hash()` in oracle-checked paths — it has no
    * cross-engine twin; `pmod(hash(...))` remains the cluster-internal
    * batching hash, checked rows-only.)
    */
  def hash56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** Driver-side twin of [[hash56]] for building literal structures
    * (e.g. the consistent-hash ring) that must agree bit-for-bit with the
    * engine-side hash: first 7 md5 bytes (14 hex digits) as a
    * non-negative Long.
    */
  def hash56Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(7).map("%02x".format(_)).mkString, 16)
  }

  /** Universal-hash family over a 56-bit input, mod a 31-bit prime:
    * h_i(x) = (a_i * (x mod P) + b_i) mod P. Products stay < 2^62 — exact
    * in 64-bit arithmetic in both engines.
    */
  val P: Long = 1000000007L
  def uhash(x: Column, a: Long, b: Long): Column =
    (lit(a) * (x % lit(P)) + lit(b)) % lit(P)

  /** Deterministic per-index coefficients for the minhash family (any fixed
    * odd constants work; these are small primes mixed to look independent).
    */
  def coeffA(i: Int): Long = 2654435761L % P * (2 * i + 1) % P
  def coeffB(i: Int): Long = (40503L * (i + 1) * (i + 1) + 7L) % P

  /** Whitespace tokenization, lowercased — twin:
    * DuckDB `string_split_regex(lower(s), '\s+')`.
    */
  def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Occurrence count of a literal substring via length arithmetic — exact
    * integer math in both engines (no regex dialect drift).
    */
  def occurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(replace(haystack, lit(needle), lit("")))) / needle.length)
      .cast("long")
}
