package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[NGramShingles]]: one tight loop building the distinct
  * word n-gram set of a token array. Called from generated code, so
  * the whole shingling stays inside the WholeStageCodegen span without
  * per-element lambda interpretation (the HOF formulation of the same
  * logic measured ~10 s for 5k docs; this is ~100 ms). */
object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  def distinctGrams(tokens: ArrayData, n: Int): ArrayData = {
    val out = new java.util.LinkedHashSet[UTF8String]()
    eachGram(tokens, n, g => out.add(g))
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Like [[distinctGrams]] but keeps duplicates (and their order) —
    * the input to within-document repetition metrics, where the
    * duplicate count IS the signal. */
  def allGrams(tokens: ArrayData, n: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    eachGram(tokens, n, g => { out += g; () })
    new GenericArrayData(out.toArray)
  }

  private def eachGram(tokens: ArrayData, n: Int, f: UTF8String => Unit): Unit = {
    val len = tokens.numElements()
    if (len < n) {
      // degenerate doc: single shingle = all tokens joined
      val all = new Array[UTF8String](len)
      var i = 0
      while (i < len) { all(i) = tokens.getUTF8String(i); i += 1 }
      f(UTF8String.concatWs(Space, all: _*))
    } else {
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        f(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
    }
  }
}

/** Word n-gram shingles of a token array — custom Catalyst expression
  * with codegen (SURVEY.md §4: built-ins can't express this without
  * interpreted higher-order lambdas). `distinct = true` (the dedup
  * default) emits the shingle SET; `distinct = false` keeps duplicates
  * in order, for repetition metrics. */
case class NGramShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  private def fn: String = if (distinct) "distinctGrams" else "allGrams"

  override def nullSafeEval(input: Any): Any =
    if (distinct) ShingleUtil.distinctGrams(input.asInstanceOf[ArrayData], n)
    else ShingleUtil.allGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleUtil.$fn($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrapper for [[NGramShingles]]. */
object ShingleCol {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def nGramShingles(tokens: Column, n: Int, distinct: Boolean = true): Column =
    ColumnBridge.column(
      NGramShingles(ColumnBridge.expression(tokens), n, distinct))
}
