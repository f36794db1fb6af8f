package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom
import graft.operators.Relational

/** Bloom prefilter: no false negatives, real pruning, and the
  * composed bloom-join equals the plain semi-join. */
class BloomSpec extends SparkSpecBase {

  private lazy val orders = graft.core.Tables(spark, Sf).orders
  private lazy val hot = graft.core.Tables(spark, Sf).customer
    .filter(col("c_acctbal") > 9500).select(col("c_custkey"))

  test("prefilter keeps every true match (no false negatives)") {
    val bloom = Bloom.build(hot, col("c_custkey"))
    val pre = Bloom.prefilter(orders, col("o_custkey"), bloom)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val exact = orders.join(hot, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(pre),
      s"missing ${(exact -- pre).take(5)} of ${exact.size} true matches")
  }

  test("prefilter actually prunes the fact side") {
    val bloom = Bloom.build(hot, col("c_custkey"))
    val total = orders.count()
    val kept = Bloom.prefilter(orders, col("o_custkey"), bloom).count()
    info(s"bloom kept $kept of $total order rows")
    // 74 hot keys of 1500 customers → with a 2^16-bit / 2-hash filter
    // the pass rate should be well under half even with false positives
    assert(kept < total / 2, s"bloom pruned nothing: $kept of $total")
  }

  test("bloom on an empty key set: all-zero table, prefilter drops every row") {
    // zero keys → the ungrouped pack still emits ONE row (1024 zero
    // words), so the probe plan is unchanged and everything fails the
    // bit test — the vacuous no-false-negative case
    val none = hot.filter(col("c_custkey") < 0)
    val bloom = Bloom.build(none, col("c_custkey"))
    assert(bloom.count() == 1L, "empty build must still emit the 1-row table")
    assert(Bloom.prefilter(orders, col("o_custkey"), bloom).count() == 0L)
  }

  test("q_bloom_join equals the plain semi-join") {
    val got = Relational.qBloomJoin(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = orders.join(hot, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
