package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity as a native Catalyst expression with codegen —
  * the "drop to a custom Expression only where built-ins can't express it
  * efficiently" path (SURVEY.md §4/§7.5): the declarative form
  * (three zip_with/aggregate higher-order folds — Similarity.cosine) walks
  * each array three times through interpreted lambda dispatch; this fuses
  * dot, |a|² and |b|² into ONE primitive loop inside whole-stage codegen.
  *
  * Bit-compatible with the declarative form: each accumulator performs the
  * same IEEE additions in the same order, so oracle hashes are unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> (call sites cast — AbstractDataType
  // / ExpectsInputTypes are sql-package-private in Spark 4, so declarative
  // input coercion isn't available to external expressions).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, i, n) = (ctx.freshName("dot"), ctx.freshName("na"),
        ctx.freshName("nb"), ctx.freshName("i"), ctx.freshName("n"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering graft's native functions — enabled with
  * `spark.sql.extensions=graft.functions.GraftExtensions`; call sites use
  * `functions.call_function("graft_cosine", a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n)
        throw new IllegalArgumentException(
          s"$name requires exactly $n arguments, got ${children.length}")
      build(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      arity("graft_cosine", 2)(c => CosineSimilarity(c.head, c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      arity("graft_winnow", 3)(c => WinnowFingerprints(c.head, c(1), c(2)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
      arity("graft_shingles", 2)(c => ShingleHashes(c.head, c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      arity("graft_minhash", 2)(c => MinHashSignature(c.head, c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash"),
      arity("graft_simhash", 1)(c => SimHashSignature(c.head))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      arity("graft_nfc", 1)(c => NfcNormalize(c.head))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "graft_nfkc"),
      arity("graft_nfkc", 1)(c => NfkcNormalize(c.head))))
  }
}
