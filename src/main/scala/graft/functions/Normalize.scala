package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernel: NFC composition followed by the
  * SIMPLE (1:1 per-code-point) lowercase mapping — the normalization
  * a text pipeline applies before any content keying (dedup
  * fingerprints, shingles, token counts), fused into one O(len)
  * codegen'd pass per row.
  *
  * Two deliberate choices make it portable where `lower()` is not
  * (the [[TextAnalysis.asciiFold]] hazard class):
  *  - `Character.toLowerCase(int)` is the UnicodeData simple mapping:
  *    locale-independent (unlike `String.toLowerCase`, which maps
  *    I → ı under tr_TR) and strictly 1:1 (İ → i, never the
  *    full-mapping i + COMBINING DOT ABOVE) — exactly the semantics
  *    of DuckDB's utf8proc `lower`, so the oracle twin is
  *    `lower(nfc_normalize(x))`. Code points without a lowercase
  *    mapping (CJK, math-alphanumeric astrals, emoji) pass through.
  *  - NFC FIRST, then fold — the same order as the oracle; composing
  *    before folding also means a decomposed É (E + combining acute)
  *    folds to é like its composed twin, so near-dup keys agree
  *    across source encodings.
  *
  * No whitespace handling here: collapse/trim compose on top with
  * the engine-portable ASCII `\s+` regex (Java and RE2 agree; both
  * leave U+3000 alone), keeping this kernel a pure character map. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  def compute(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeText", this,
      classOf[NormalizeText].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Normalize {
  /** NFC + simple casefold (see [[NormalizeText]]). */
  def normalizeText(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}
