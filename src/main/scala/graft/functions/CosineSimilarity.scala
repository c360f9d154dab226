package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression (SURVEY.md §2.10 X4): cosine similarity over
  * two float-array columns with `doGenCode` — one fused loop in generated
  * Java, no per-element boxing, no intermediate arrays.
  *
  * This is the engine's one deliberate step below the public API, taken
  * because the hot inner loop of similarity search runs
  * |queries| x |corpus| x dim times: the public higher-order-function
  * formulation (zip_with + aggregate, see SimilaritySearch.cosine) is
  * interpreted and allocates an intermediate array per row pair.
  * Both formulations compute in double precision in index order and agree
  * bit-for-bit on well-formed inputs; the HOF version remains as the
  * public-API fallback (SURVEY.md §4's rule: custom internals only behind
  * a working public-API twin).
  *
  * Semantics: zero vector (or empty array) → 0.0; mismatched lengths use
  * the common prefix; null input → null (NullIntolerant via
  * BinaryExpression's default nullSafeEval path).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Input typing enforced structurally (AbstractDataType is private[sql]):
  // both children must already be array<float> (any nullability), as
  // produced by the callers in graft.operators; anything else fails here.
  require(Seq(left, right).forall(e => !e.resolved || (e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  })), "cosine_sim expects array<float> inputs")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na > 0 && $nb > 0)
         |  ? $dot / (Math.sqrt($na) * Math.sqrt($nb)) : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
