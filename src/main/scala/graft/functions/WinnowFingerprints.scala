package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint extraction as a native Catalyst expression — the
  * second "drop to a custom Expression where built-ins can't express it
  * EFFICIENTLY" site (after [[CosineSimilarity]]). The declarative form
  * (`Dedup.winnowingOverlap`'s codepoint transform → per-position
  * slice/aggregate polynomial fold → per-window slice/array_min) is three
  * nested higher-order functions, and Spark HOFs run OUTSIDE whole-stage
  * codegen: every lambda application is interpreted with boxing, which
  * makes the map side of the operator lambda-dispatch-bound (~chars ×
  * (k + window) interpreted calls per doc). This expression fuses the
  * whole extraction into one primitive JIT'd loop per document.
  *
  * VALUE-COMPATIBLE with the declarative pipeline by construction — the
  * same Karp–Rabin fold ((h·131 + cp) mod 1e15+37 over codepoints, Spark
  * `ascii`-compatible: full Unicode code points), the same
  * `greatest(..., 1)` short-input edges (empty text hashes the single
  * codepoint 0, exactly like `ascii(substring('', 1, 1))`), the same
  * per-window minima and first-occurrence-ordered distinct — so swapping
  * it into the operator changes no query result and the DuckDB oracle is
  * unchanged.
  *
  * Registered as `graft_winnow(text, k, window)` via [[GraftExtensions]];
  * k and window must be foldable integers.
  */
case class WinnowFingerprints(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  // ExpectsInputTypes is sql-package-private in Spark 4 (see
  // CosineSimilarity), so input validation is manual: a readable analysis
  // error instead of a runtime ClassCastException on graft_winnow(t, 12L, 8L)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (first.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_winnow: first argument must be STRING, got ${first.dataType.sql}")
    else if (second.dataType != org.apache.spark.sql.types.IntegerType ||
        third.dataType != org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "graft_winnow: k and window must be INT literals, got " +
          s"${second.dataType.sql}, ${third.dataType.sql}")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_winnow: k and window must be foldable (literals)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowFingerprints.compute(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) => {
      // one static call per row — the loop itself is JIT-compiled once;
      // staying inside nullSafeCodeGen keeps the expression in the
      // surrounding whole-stage-codegen plan
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($t, $k, $w);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): WinnowFingerprints =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFingerprints {
  private val P = 1000000000000037L

  /** See the class scaladoc for the value-compatibility contract. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps0 = text.toString.codePoints().toArray
    val cps = if (cps0.isEmpty) Array(0) else cps0
    val len = cps.length
    val grams = math.max(len - k + 1, 1)
    val gh = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      var a = 0L
      var j = i
      val end = math.min(i + k, len)
      while (j < end) { a = (a * 131 + cps(j)) % P; j += 1 }
      gh(i) = a
      i += 1
    }
    val windows = math.max(grams - w + 1, 1)
    val distinct = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < windows) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, grams)
      while (j < end) { if (gh(j) < m) m = gh(j); j += 1 }
      distinct.add(m)
      i += 1
    }
    val out = new Array[Long](distinct.size)
    val it = distinct.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
