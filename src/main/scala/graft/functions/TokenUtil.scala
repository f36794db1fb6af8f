package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[AsciiTokens]]: single byte-scan tokenization of a
  * UTF8String into `[A-Za-z]`(`0-9`) runs. ASCII token classes are
  * byte-safe in UTF-8 (continuation bytes are ≥ 0x80), and treating
  * everything else as a delimiter is exactly the reference
  * framework's tokenizer. java.util.regex `split()` on the same
  * class measured 58 s for a 406 MB corpus; this scan is ~10×
  * faster and allocation-lean (token slices, no intermediate empty
  * strings). */
object TokenUtil {
  def tokens(s: UTF8String, includeDigits: Boolean): ArrayData = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[Any]()
    var i = 0
    var start = -1
    while (i < bytes.length) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (includeDigits && b >= '0' && b <= '9')
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(bytes, start, i - start)); start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, bytes.length - start))
    new GenericArrayData(out.toArray)
  }
}

/** `[A-Za-z]+` (or `[A-Za-z0-9]+`) token runs of a string column —
  * custom codegen expression replacing regex split on the wordcount
  * hot path (SURVEY.md §4/§5). */
case class AsciiTokens(child: Expression, includeDigits: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ascii_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenUtil.tokens(input.asInstanceOf[UTF8String], includeDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenUtil.tokens($c, $includeDigits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCol {
  /** Letter runs (the `documents` tokenizer — matches the
    * `[^A-Za-z]+` split oracle). */
  def letterTokens(c: Column): Column =
    ColumnBridge.column(AsciiTokens(ColumnBridge.expression(c), includeDigits = false))

  /** Alphanumeric runs (the reference wordcount tokenizer). */
  def alnumTokens(c: Column): Column =
    ColumnBridge.column(AsciiTokens(ColumnBridge.expression(c), includeDigits = true))
}
