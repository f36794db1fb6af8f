package graft

import org.apache.spark.sql.functions._

import graft.functions.Skew
import graft.sources.IO

/** Salting preserves join semantics; bucketed tables join without a
  * shuffle. */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of rows carry key 1 (a hot key)
    val large = spark.range(0, 10000)
      .select((when(col("id") % 10 === 0, col("id") % 7).otherwise(1L))
        .as("k"), col("id").as("v"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("co-bucketed tables join with no exchange") {
    val orders = graft.core.Tables(spark, Sf).orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.core.Tables(spark, Sf).lineitem
      .select("l_orderkey", "l_quantity")
    // clean any stale table/location from a previous JVM run
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    IO.writeBucketed(orders, "b_orders", 8, "o_orderkey")
    IO.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", 8, "o_orderkey")
    // at test scale Spark would broadcast (also shuffle-free); disable
    // it so the plan demonstrates the bucket-co-location path a 100 TB
    // fact-fact join takes
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, got) = try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      val rows = joined.collect()
      (joined.queryExecution.executedPlan.toString,
        rows.map(r => (r.getLong(0), r.getDouble(1))).toMap)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // bucket co-location: the join itself needs no Exchange (the only
    // exchange allowed is the final single-partition/agg one)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join operator reading buckets:\n$plan")
    val joinIdx = plan.indexOf("Join")
    val exchanges = plan.substring(joinIdx).split("\n")
      .count(_.contains("Exchange hashpartitioning(o_orderkey"))
    assert(exchanges == 0, s"bucketed join should not re-shuffle:\n$plan")
    // and it computes the right thing
    val want = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == want)
  }
}
