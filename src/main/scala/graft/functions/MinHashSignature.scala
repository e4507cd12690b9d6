package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** All `numHashes` minhash values of a feature-hash set in ONE array
  * walk — the fourth fused-Expression site. The declarative signature
  * step is `numHashes` separate `array_min(transform(features, uhash))`
  * columns, i.e. 16 INTERPRETED walks of every doc's feature array
  * (Spark HOF lambdas run outside whole-stage codegen — the x125
  * lesson); here each element updates all 16 running minima inside one
  * JIT'd loop, so the per-doc cost drops from 16 array traversals plus
  * lambda dispatch to one traversal of multiply-add-compare.
  *
  * VALUE-IDENTICAL to the declarative columns by construction: the same
  * `Portable.coeffA/coeffB/P` family and the same
  * `(a · (h mod P) + b) mod P` evaluation order, pinned per-doc against
  * the 16-column computation on the real corpus (OperatorSpec). An EMPTY
  * feature array yields NULL — exactly what the declarative
  * `array_min(transform(...))` columns produce on an empty input — so the
  * SQL-registered surface stays analyzable-in/null-out for user-supplied
  * arrays instead of crashing tasks. Internal callers feed
  * `graft_shingles` output, which is never empty (the k-token shingler
  * emits ≥ 1 shingle for any string), so the null path is unreachable in
  * the dedup family.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Null on empty input (the array_min convention), so nullable even when
  // the child is not.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case ArrayType(LongType, _) =>
        if (right.dataType != IntegerType || !right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_minhash: numHashes must be an INT literal")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash: first argument must be ARRAY<BIGINT>, got ${other.sql}")
    }
  }

  override def nullSafeEval(f: Any, n: Any): Any = {
    val feats = f.asInstanceOf[ArrayData]
    if (feats.numElements() == 0) null
    else MinHashSignature.compute(feats, n.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, n) =>
      s"""
         |if ($f.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashSignature.compute($f, $n);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  private val P = Portable.P

  /** Column-level constructor (ColumnBridge — no registry needed). */
  def ofCol(features: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(features),
        Literal(numHashes)))

  /** Per-n coefficient tables, built once per JVM (tiny, immutable). */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffs(n: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(n, { m =>
      val a = Array.tabulate(m)(Portable.coeffA)
      val b = Array.tabulate(m)(Portable.coeffB)
      (a, b)
    })

  /** Core loop. Callers (eval + codegen) handle the empty-array → null
    * case before reaching here; `m == 0` would return an all-MaxValue
    * signature, which is never what anyone means.
    */
  def compute(feats: ArrayData, n: Int): ArrayData = {
    val m = feats.numElements()
    val (a, b) = coeffs(n)
    val out = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val hm = feats.getLong(j) % P
      var i = 0
      while (i < n) {
        val v = (a(i) * hm + b(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
