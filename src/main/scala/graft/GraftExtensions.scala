package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import graft.functions.{AsciiTokens, CosineSimilarity, NGramShingles}

/** SQL surface for graft's custom Catalyst expressions.
  *
  * Config-based (cluster-wide):
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  * or runtime on an existing session:
  * {{{ GraftFunctions.register(spark) }}}
  * after which `SELECT cosine_sim(a, b)` and
  * `SELECT ngram_shingles(tokens, 3)` work from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  private def cosineBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "cosine_sim(vector, vector)")
    CosineSimilarity(exprs(0), exprs(1))
  }

  private def shinglesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "ngram_shingles(tokens, n)")
    val n = exprs(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"ngram_shingles: n must be an integer literal, got $other")
    }
    NGramShingles(exprs(0), n)
  }

  private def tokensBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.nonEmpty && exprs.length <= 2,
      "ascii_tokens(text[, include_digits])")
    val digits = exprs.lift(1) match {
      case None => false
      case Some(Literal(b: Boolean, BooleanType)) => b
      case Some(other) => throw new IllegalArgumentException(
        s"ascii_tokens: include_digits must be a boolean literal, got $other")
    }
    AsciiTokens(exprs.head, digits)
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ascii_tokens"),
      new ExpressionInfo(classOf[AsciiTokens].getName, "ascii_tokens"),
      tokensBuilder _),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      cosineBuilder _),
    (FunctionIdentifier("ngram_shingles"),
      new ExpressionInfo(classOf[NGramShingles].getName, "ngram_shingles"),
      shinglesBuilder _))

  /** Runtime registration on an already-created session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
