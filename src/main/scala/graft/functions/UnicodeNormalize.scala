package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst `Expression` — the text
  * canonicalization step every multilingual training-data pipeline runs
  * before tokenization/dedup (NFC so visually-identical strings fingerprint
  * identically; mark-stripping for accent-insensitive matching). Spark has
  * no built-in for this; a native expression with `doGenCode` keeps the hot
  * path inside whole-stage codegen (same rationale as [[PolyHash]]).
  *
  * `stripMarks` removes combining marks (Unicode category M) AFTER an NFD
  * decomposition — é → e — matching DuckDB's `strip_accents` on Latin text,
  * which the oracle uses. The reference's closest analog is its
  * search-index field analyzers (tokenization/normalization config in
  * `aleph2_data_model/.../DataSchemaBean.java` SearchIndexSchema); the
  * normalization itself lived in Elasticsearch, so this is the engine-side
  * re-expression.
  */
case class UnicodeNorm(child: Expression, form: String, stripMarks: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  // resolve ONCE at construction: an invalid form fails fast at plan time
  // (not per-row deep in a task), nothing user-supplied is ever
  // interpolated into generated Java source, and the hot loop skips the
  // per-row enum lookup
  private val normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNorm.runForm(
      input.asInstanceOf[UTF8String].toString, normForm, stripMarks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("normForm", normForm,
      "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UnicodeNorm.runForm($c.toString(), $formRef, $stripMarks));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {
  /** String-form convenience (tests, ad-hoc callers). */
  def run(s: String, form: String, stripMarks: Boolean): String =
    runForm(s, Normalizer.Form.valueOf(form), stripMarks)

  /** Static worker shared by eval and codegen (PolyHash.step pattern). */
  def runForm(s: String, form: Normalizer.Form, stripMarks: Boolean): String = {
    if (!stripMarks) return Normalizer.normalize(s, form)
    // decompose so every mark is its own code point, drop category-M points
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // recompose what's left so output is canonical regardless of the
    // requested form (strip_accents in DuckDB returns composed text)
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }
}
