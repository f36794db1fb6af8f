package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, NGramShingles}

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

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
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
