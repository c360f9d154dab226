package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY.md §2.10 X4): Unicode normalization
  * of a string column to a canonical form — `unicode_normalize(str, form)`
  * with form one of NFC/NFD/NFKC/NFKD.
  *
  * Spark has no built-in for this, yet it is the first stage of every
  * standard corpus-prep pipeline (CCNet and Gopher both normalize before
  * tokenization: composed vs decomposed accents otherwise split identical
  * words into distinct token streams and break exact-dedup on visually
  * identical documents). A JVM expression beats a UDF here: null handling,
  * codegen integration, and SQL registration come from BinaryExpression,
  * and the body delegates to `java.text.Normalizer` — the JDK's
  * implementation of the public Unicode Standard Annex #15 algorithm, the
  * same spec DuckDB's `nfc_normalize` implements (the t13 oracle relies on
  * that bit-equality).
  *
  * Semantics: null string → null; the form argument must be a foldable
  * string (checked at construction in GraftExtensions) — an invalid form
  * name fails fast per-row via `Form.valueOf` (IllegalArgumentException),
  * never silently passes through.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  require(Seq(left, right).forall(e => !e.resolved || e.dataType == StringType),
    "unicode_normalize expects (string, string) inputs")

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any, f: Any): Any =
    UTF8String.fromString(UnicodeNormalize.normalize(
      s.asInstanceOf[UTF8String].toString, f.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, f) => {
      val helper = UnicodeNormalize.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $helper.normalize($s.toString(), $f.toString()));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UnicodeNormalize {
  /** Static helper shared by eval and generated code. Skips the (allocating)
    * normalization pass when the input is already in the requested form —
    * the overwhelmingly common case for real corpora, and `isNormalized`
    * is a cheap quick-check scan.
    */
  def normalize(s: String, form: String): String = {
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(s, f)) s else Normalizer.normalize(s, f)
  }
}
