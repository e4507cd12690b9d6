package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the first
  * step of web-crawl text cleaning ("café" arrives both precomposed
  * U+00E9 and decomposed e+U+0301; every hash/dedup/tokenize step after
  * this sees ONE canonical byte form). Spark ships no normalizer
  * function, and a UDF here would sit on the hottest map side of the
  * cleaning pipeline; this wraps `java.text.Normalizer` (JDK, no extra
  * dependency) behind `doGenCode` so it stays inside whole-stage codegen
  * like the other graft_* expressions.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for the overwhelming majority of real text (ASCII and CJK
  * ideographs have no decompositions), so already-normal rows return the
  * INPUT UTF8String untouched — the normalize-and-copy cost is paid only
  * by the denormalized minority.
  *
  * Cross-engine note: DuckDB's `nfc_normalize` (utf8proc) computes the
  * same canonical composition; the oracle relies on agreement over the
  * stable canonical-composition set (Unicode normalization is stability-
  * guaranteed since 4.1 — a composition pair never changes meaning).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_nfc: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NfcNormalize.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Column-level constructor (ColumnBridge — no registry needed). */
  def ofCol(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** Unicode NFKC (compatibility) normalization — `graft_nfc`'s sibling for
  * the COMPATIBILITY class: fullwidth forms (Ａ→A, ０→0), ligatures
  * (ﬁ→fi), superscripts (²→2), halfwidth katakana, etc. Unlike NFC this
  * is LOSSY by design (it erases stylistic distinctions), so it is an
  * opt-in knob on the cleaning operators, never the default: right for
  * token/dedup canonicalization of adversarial or crawl text where
  * "ｆｒｅｅ ｍｏｎｅｙ" must hash like "free money", wrong for text whose
  * presentation forms carry meaning. Same isNormalized fast path and
  * codegen shape as [[NfcNormalize]].
  *
  * Cross-engine note: DuckDB exposes no NFKC twin, so oracle coverage
  * comes from planted compatibility characters with known expansions
  * (the strict entry constructs the expected output explicitly) plus
  * JDK-side specs — not from an independent second implementation like
  * x147's nfc_normalize oracle.
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfkc"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_nfkc: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any): Any =
    NfkcNormalize.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NfkcNormalize.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): NfkcNormalize = copy(child = newChild)
}

object NfkcNormalize {
  import java.text.Normalizer

  /** Column-level constructor (ColumnBridge — no registry needed). */
  def ofCol(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NfkcNormalize(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFKC))
  }
}
