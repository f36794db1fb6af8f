package graft

import org.apache.spark.sql.functions._

import graft.core.{MapReduce, Tables}
import graft.operators.TextMR

/** The typed generic map/reduce contract produces the same result as
  * the DataFrame formulation of the reference's flagship workload. */
class MapReduceSpec extends SparkSpecBase {

  test("typed MapReduce.wordCount matches the DataFrame wordcount") {
    import spark.implicits._
    implicit val s = spark
    val lines = Tables(spark, Sf).documents
      .select(col("text")).as[String]
    val typed = MapReduce.wordCount(lines).collect().toMap
    val df = TextMR.wordcount(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == df)
    assert(typed.nonEmpty)
  }

  test("generic run applies map-side combine semantics (associative reduce)") {
    import spark.implicits._
    val nums = spark.range(0, 1000).as[Long]
    val out = MapReduce.run(nums)(n => Seq((n % 7, n)))(_ + _)
      .collect().toMap
    val expected = (0L until 1000L).groupBy(_ % 7).map { case (k, v) => k -> v.sum }
    assert(out == expected)
  }
}
