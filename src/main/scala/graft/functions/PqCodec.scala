package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization kernels (X4 family, siblings of
  * [[VectorDot]]/[[CosineSimilarity]]) — round-16 optimization.
  *
  * The original PQ encode/ADC-table formulation composed m·ksub `vector_dot`
  * calls over slice()+literal columns into ONE projection. At the
  * registered grid (m=16, ksub=64) that is 1,024 dot expressions: Catalyst
  * generates a ~7,800-line Java class that Janino FAILS to compile
  * (`InternalCompilerException`, measured in the r16 profile), so every
  * encode stage paid a ~1 s failed-compile attempt on the driver and then
  * ran INTERPRETED over the corpus. These expressions compute the same
  * arithmetic in one tight generated loop — bit-for-bit equal by
  * construction (NativeExprSpec pins equality against the old composed
  * formulation on fixture data):
  *
  *  - the dot per (subspace s, centroid j) accumulates left-to-right in
  *    double over `min(subDim, len(vec) - s·subDim)` elements, exactly
  *    [[VectorDot]] over `slice(vec, s·subDim+1, subDim)` vs the float
  *    centroid literal;
  *  - [[PqEncode]]'s argmin is dist_j = dot_j·(−2) + Σc², first index
  *    wins ties — exactly `array_position(dists, array_min(dists)) − 1`
  *    over non-NaN doubles;
  *  - [[PqAdcTable]] emits the m·ksub dots s-major — exactly the old
  *    `array(...)` construction.
  *
  * The codebook rides the expression as a plain flat field (m·ksub·subDim
  * floats, s-major then j then i — KBs), entering generated code via ONE
  * `references` slot instead of 1,024 literal arrays.
  */
trait PqKernel { self: UnaryExpression =>
  def flat: Array[Float]
  def m: Int
  def ksub: Int

  require(m > 0 && ksub > 0 && flat.length % (m * ksub) == 0,
    s"flat codebook length ${flat.length} not divisible by m*ksub=${m * ksub}")
  protected val subDim: Int = flat.length / (m * ksub)

  /** Σ x² per centroid, left-to-right in double over the float values —
    * the exact arithmetic of the old `c.map(x => x.toDouble * x).sum`.
    */
  protected lazy val cnsq: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var c = 0
    while (c < out.length) {
      var s = 0.0
      var i = 0
      while (i < subDim) { val x = flat(c * subDim + i).toDouble; s += x * x; i += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float>, got ${other.simpleString}")
    }
}

/** `pq_encode(vec, flat_codebook, m, ksub)` → array<int> of m codes. */
case class PqEncode(child: Expression, flat: Array[Float], m: Int, ksub: Int)
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var bound = len - off
      if (bound > subDim) bound = subDim
      if (bound < 0) bound = 0
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cOff = (s * ksub + j) * subDim
        var dot = 0.0
        var i = 0
        while (i < bound) {
          dot += vec.getFloat(off + i).toDouble * flat(cOff + i).toDouble
          i += 1
        }
        val d = dot * -2.0 + cnsq(s * ksub + j)
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "float[]")
      val cnsqRef = ctx.addReferenceObj("pqCnsq", cnsq, "double[]")
      val codes = ctx.freshName("codes")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val bound = ctx.freshName("bound")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      s"""
         |int $len = $v.numElements();
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $bound = $len - $s * $subDim;
         |  if ($bound > $subDim) $bound = $subDim;
         |  if ($bound < 0) $bound = 0;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $bound; $i++) {
         |      $dot += (double) $v.getFloat($s * $subDim + $i)
         |        * (double) $flatRef[($s * $ksub + $j) * $subDim + $i];
         |    }
         |    double $d = $dot * -2.0 + $cnsqRef[$s * $ksub + $j];
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc_table(vec, flat_codebook, m, ksub)` → array<double> of the
  * m·ksub subspace dots, s-major — the per-query ADC lookup table.
  */
case class PqAdcTable(child: Expression, flat: Array[Float], m: Int, ksub: Int)
    extends UnaryExpression with PqKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val tbl = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var bound = len - off
      if (bound > subDim) bound = subDim
      if (bound < 0) bound = 0
      var j = 0
      while (j < ksub) {
        val cOff = (s * ksub + j) * subDim
        var dot = 0.0
        var i = 0
        while (i < bound) {
          dot += vec.getFloat(off + i).toDouble * flat(cOff + i).toDouble
          i += 1
        }
        tbl(s * ksub + j) = dot
        j += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(tbl)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "float[]")
      val tbl = ctx.freshName("tbl")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val bound = ctx.freshName("bound")
      val dot = ctx.freshName("dot")
      s"""
         |int $len = $v.numElements();
         |double[] $tbl = new double[${m * ksub}];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $bound = $len - $s * $subDim;
         |  if ($bound > $subDim) $bound = $subDim;
         |  if ($bound < 0) $bound = 0;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $bound; $i++) {
         |      $dot += (double) $v.getFloat($s * $subDim + $i)
         |        * (double) $flatRef[($s * $ksub + $j) * $subDim + $i];
         |    }
         |    $tbl[$s * $ksub + $j] = $dot;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($tbl);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
