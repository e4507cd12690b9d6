package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a document in ONE map-side pass — the fifth fused
  * Expression, and like `graft_shingles` it is a PLAN-SHAPE win, not
  * just lambda fusion: the declarative signature exploded every token
  * into a (doc, token-hash) row and paid a doc-keyed shuffle into 21
  * lane-packed aggregate columns just to count hash bits per doc. Here
  * the per-token bit counting happens inside one JIT'd loop over the
  * tokens of the row, so signature extraction is map-only and the
  * operator's first exchange disappears.
  *
  * VALUE-IDENTICAL to the declarative pipeline by construction: the
  * same lowercase + `\s+` split tokenization (Spark `split` limit
  * semantics), the same per-token `Portable.hash56` (first 7 md5 bytes
  * as a non-negative long — token multiplicity COUNTS, unlike the
  * distinct shingle sets), and the same majority rule (bit j set iff
  * 2·cnt_j > total; hash56 is 56-bit so bits 56–59 are never set, as
  * before). Pinned per-doc against the lane-packed aggregation on the
  * real corpus (OperatorSpec).
  */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash: argument must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any): Any =
    SimHashSignature.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.SimHashSignature.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSignature = copy(child = newChild)
}

object SimHashSignature {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Bits = 60

  /** Column-level constructor (ColumnBridge — no registry needed). */
  def ofCol(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  def compute(text: UTF8String): Long = {
    val toks = Ws.split(text.toLowerCase.toString, -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val cnt = new Array[Int](Bits)
    var total = 0
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      total += 1
      var j = 0
      while (j < Bits) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (2L * cnt(j) > total) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
