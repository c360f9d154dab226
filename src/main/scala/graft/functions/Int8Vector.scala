package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Packed int8 vector codes (X4 family, siblings of CosineSimilarity /
  * VectorDot): the storage form of the s07 scalar quantization.
  *
  * Blob layout: [8-byte big-endian IEEE-754 scale][dim signed code bytes],
  * i.e. dim+8 bytes per vector vs 4·dim for the float array — 3.6x smaller
  * at dim 64, and the gap is what the scan, the shuffle, and the executor
  * cache carry at 100 TB. Codes are floor(v/scale + 0.5) with
  * scale = max(1e-30, max|v|)/127 — EXACTLY the arithmetic of
  * `SimilaritySearch.int8Quantize`, so the packed path scores
  * bit-identically to the DuckDB-oracled array<int> path (spec-pinned).
  */
case class Int8Pack(child: Expression) extends UnaryExpression {

  require(!child.resolved || (child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }), "int8_pack expects an array<float|double> input")

  override def dataType: DataType = BinaryType

  override def prettyName: String = "int8_pack"

  private def isFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = math.max(maxAbs, 1e-30) / 127.0
    val out = new Array[Byte](8 + n)
    val bits = java.lang.Double.doubleToLongBits(scale)
    var b = 0
    while (b < 8) { out(b) = (bits >>> ((7 - b) * 8)).toByte; b += 1 }
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(8 + i) = math.floor(x / scale + 0.5).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = $v.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = Math.abs($get);
         |  if ($x > $maxAbs) $maxAbs = $x;
         |}
         |double $scale = Math.max($maxAbs, 1e-30) / 127.0;
         |byte[] $out = new byte[8 + $n];
         |long $bits = Double.doubleToLongBits($scale);
         |for (int $b = 0; $b < 8; $b++) { $out[$b] = (byte) ($bits >>> ((7 - $b) * 8)); }
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[8 + $i] = (byte) Math.floor(($get) / $scale + 0.5);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Quantized cosine over two packed blobs: integer dot and integer norms
  * over the code bytes in one pass (scales cancel in cosine, so the header
  * is skipped). Evaluation order matches the HOF/oracle pipeline exactly —
  * `dot / (sqrt(na2) * sqrt(nb2))`, every intermediate an
  * exactly-representable integer — so packed scores hash-match the s07
  * oracle. All-zero vectors (na2/nb2 = 0) score 0.0, same guard as the
  * unpacked path.
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  require(Seq(left, right).forall(e => !e.resolved || e.dataType == BinaryType),
    "int8_cosine expects packed binary inputs (int8_pack output)")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "int8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    // Mixed-dimension joins and truncated blobs are data corruption, not
    // something to silently score over a prefix — fail loudly.
    if (x.length != y.length || x.length < 8)
      throw new IllegalArgumentException(
        s"int8_cosine: malformed or mismatched packed blobs " +
          s"(${x.length} vs ${y.length} bytes; need equal lengths >= 8)")
    val n = x.length - 8
    var dot = 0L
    var na2 = 0L
    var nb2 = 0L
    var i = 0
    while (i < n) {
      val xi = x(8 + i).toLong
      val yi = y(8 + i).toLong
      dot += xi * yi
      na2 += xi * xi
      nb2 += yi * yi
      i += 1
    }
    if (na2 > 0L && nb2 > 0L) dot / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble))
    else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na2 = ctx.freshName("na2")
      val nb2 = ctx.freshName("nb2")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.length != $b.length || $a.length < 8) {
         |  throw new IllegalArgumentException(
         |    "int8_cosine: malformed or mismatched packed blobs (" +
         |      $a.length + " vs " + $b.length + " bytes; need equal lengths >= 8)");
         |}
         |int $n = $a.length - 8;
         |long $dot = 0L; long $na2 = 0L; long $nb2 = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) $a[8 + $i];
         |  long $yi = (long) $b[8 + $i];
         |  $dot += $xi * $yi; $na2 += $xi * $xi; $nb2 += $yi * $yi;
         |}
         |${ev.value} = ($na2 > 0L && $nb2 > 0L)
         |  ? $dot / (Math.sqrt((double) $na2) * Math.sqrt((double) $nb2)) : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
