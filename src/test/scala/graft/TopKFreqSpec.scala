package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKFreq
import graft.operators.TextMR

class TopKFreqSpec extends SparkSpecBase {
  import spark.implicits._

  test("topK aggregator matches the exact wordcount top-10 in the exact regime") {
    val words = graft.core.Tables(spark, Sf).documents
      .select(explode(split(col("text"), "[^A-Za-z]+")).as("w"))
      .filter(col("w") =!= "").as[String]
    val got = words.select(TopKFreq.topK(10, 4096).toColumn).head()
    val want = TextMR.wordcount(spark, Sf)
      .orderBy(col("cnt").desc, col("word"))
      .limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("per-group topK via groupByKey matches per-group wordcounts") {
    val docWords = graft.core.Tables(spark, Sf).documents
      .select(col("source"), explode(split(col("text"), "[^A-Za-z]+")).as("w"))
      .filter(col("w") =!= "")
    val grouped = docWords.as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKFreq.topK(3, 4096).toColumn)
      .collect().toMap
    val truth = docWords.groupBy("source", "w").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.map(t => (t._2, t._3)).sortBy { case (w, c) => (-c, w) }.take(3).toSeq
      }
    assert(grouped == truth)
    assert(grouped.size > 1)
  }

  test("SQL-registrable TopKFreqAgg matches the typed Aggregator") {
    GraftFunctions.register(spark)
    val words = graft.core.Tables(spark, Sf).documents
      .select(explode(split(col("text"), "[^A-Za-z]+")).as("w"))
      .filter(col("w") =!= "")
    words.createOrReplaceTempView("tkf_words")
    val viaSql = spark.sql("SELECT topk_freq(w, 10) FROM tkf_words").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val viaTyped = words.as[String].select(TopKFreq.topK(10, 4096).toColumn).head()
    assert(viaSql == viaTyped)
  }

  test("truncation keeps the heaviest items when capacity is exceeded") {
    // 100 distinct items with distinct frequencies, capacity 20
    val data = (1 to 100).flatMap(i => Seq.fill(i)(s"item_$i")).toDS()
    val got = data.select(TopKFreq.topK(5, 20).toColumn).head()
    assert(got == (100 to 96 by -1).map(i => (s"item_$i", i.toLong)))
  }
}
