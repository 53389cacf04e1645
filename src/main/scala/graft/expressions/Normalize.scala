package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization in one pass: Unicode NFC composition →
  * root-locale lowercasing → ASCII-whitespace-run collapse to single
  * spaces → trim. The standard pre-dedup normalization step (exact dedup
  * on raw bytes misses "Hello  World" vs "hello world"; near-dup sketches
  * waste their tolerance budget on case/spacing noise).
  *
  * Spark has no NFC built-in, so this is a native expression rather than
  * a UDF (stays inside whole-stage codegen via one virtual call). The
  * whitespace class is exactly `[\t\n\f\r ]` — the portable intersection
  * of RE2's and Java's `\s` — so an external oracle using
  * `regexp_replace(..., '[\t\n\f\r ]+', ' ', 'g')` matches byte-exactly.
  * Lowercasing is `Locale.ROOT` (no Turkish-İ surprises); engines with
  * utf8proc-based `lower()` agree on ASCII and on the vast majority of
  * cased Unicode.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  def compute(input: UTF8String): UTF8String = {
    val composed = java.text.Normalizer
      .normalize(input.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(composed.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < composed.length) {
      val ch = composed.charAt(i)
      val isWs = ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'
      if (isWs) {
        if (started) pendingSpace = true // leading runs drop (trim)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing run never flushed (trim)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizer", this, classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}
