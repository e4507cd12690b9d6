package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-shingle hash56 set as ONE native expression — the
  * third fused-Expression site, and the one with a PLAN-SHAPE payoff
  * beyond lambda fusion: the declarative MinHash front end
  * (`Dedup.shingles` explode → `featureSets` collect_set) pays a
  * corpus-wide (doc, shingle-hash) SHUFFLE just to assemble each doc's
  * feature array, because the shingles were exploded into rows first.
  * Computing the distinct hash set per row makes the whole feature
  * extraction map-side — the shuffle disappears from every MinHash-LSH
  * consumer (x03, the incremental probes, the persisted index builds,
  * the canonical-label artifact, the x88/x103/x105 report family).
  *
  * VALUE-COMPATIBLE with `hash56(Dedup.shingles(...))` by construction:
  * Spark's own `UTF8String.toLowerCase`, Java `Pattern.split("\\s+", -1)`
  * (exactly Spark `split`'s limit and trailing-empty semantics), shingle
  * = k tokens joined by one space with the `greatest(n-k+1, 1)`
  * short-doc edge, hash = first 7 md5 bytes as a non-negative long
  * (`Portable.hash56` / `hash56Local`). Downstream consumers treat the
  * array as a SET (array_min of u-hashes, array_intersect, size), so
  * element order is irrelevant; first-occurrence order is kept anyway
  * for determinism.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles: first argument must be STRING, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingles: shingle size must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any, k: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Column-level constructor — direct Expression wrapping, so operator
    * call sites need no function-registry registration.
    */
  def ofCol(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHashes(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        Literal(k)))

  /** See the class scaladoc for the value-compatibility contract. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = Ws.split(text.toLowerCase.toString, -1)
    val n = math.max(toks.length - k + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val end = math.min(i + k, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
