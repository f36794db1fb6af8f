package graft

import org.apache.spark.sql.functions._

import graft.functions.{QuantileSketch => QS}

/** The mergeable quantile sketch: JVM bucket rule ≡ generated SQL
  * CASE chain, aggregate buffer ≡ relational bucket counts, decoded
  * estimates within the construction's relative-error bound against
  * exact quantiles, and partition invariance (the property t-digest
  * cannot offer and the reason this sketch is hash-checkable). */
class QuantileSketchSpec extends SparkSpecBase {

  private val boundaryValues: Seq[Long] = {
    val around = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 65L, 127L, 128L,
      255L, 1023L, 4096L, 12345L, 999999L)
    val powers = (6 to 62).flatMap { e =>
      val p = 1L << e
      Seq(p - 1, p, p + 1)
    }.filter(_ > 0)
    (around ++ powers :+ Long.MaxValue).distinct.sorted
  }

  test("JVM bucketOf equals the generated SQL CASE chain at every boundary") {
    import spark.implicits._
    val df = boundaryValues.toDF("v")
      .withColumn("idx_sql", expr(QS.idxCaseSql("v", "div")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    df.foreach { case (v, idxSql) =>
      assert(QS.bucketOf(v).toLong == idxSql,
        s"bucketOf($v)=${QS.bucketOf(v)} but SQL chain says $idxSql")
    }
  }

  test("JVM midpointOf equals the generated SQL decode; midpoint stays in its bucket") {
    import spark.implicits._
    val idxs = boundaryValues.map(QS.bucketOf).distinct.sorted
    val decoded = idxs.map(_.toLong).toDF("idx")
      .withColumn("mid_sql", expr(QS.midCaseSql("idx")).cast("long"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    idxs.foreach { idx =>
      val mid = QS.midpointOf(idx)
      assert(mid == decoded(idx), s"midpointOf($idx)=$mid vs SQL ${decoded(idx)}")
      // round-trips into its own bucket — the decode really is a
      // representative value, not just near one
      assert(QS.bucketOf(mid) == idx, s"midpoint $mid leaves bucket $idx")
    }
  }

  test("relative error bound: any value and its bucket midpoint within 1/32") {
    boundaryValues.filter(_ >= 64).foreach { v =>
      val mid = QS.midpointOf(QS.bucketOf(v))
      assert(math.abs(mid - v).toDouble / v <= 1.0 / 32,
        s"midpoint $mid deviates from $v beyond the bucket-width bound")
    }
    // exact region: the midpoint IS the value
    (0L until 64L).foreach(v => assert(QS.midpointOf(QS.bucketOf(v)) == v))
  }

  test("QSketchAgg buffer equals the relational groupBy(bucket) counts") {
    val cents = graft.core.Tables(spark, Sf).lineitem
      .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("v"))
    val fromAgg = cents.agg(QS.qsketchAgg(col("v")).as("qs"))
      .head().getSeq[Long](0)
    val relational = cents
      .withColumn("idx", expr(QS.idxCaseSql("v", "div")).cast("int"))
      .groupBy("idx").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fromAgg.length == QS.NumBuckets)
    fromAgg.zipWithIndex.foreach { case (cnt, idx) =>
      assert(cnt == relational.getOrElse(idx, 0L),
        s"bucket $idx: agg $cnt vs relational ${relational.getOrElse(idx, 0L)}")
    }
    assert(fromAgg.sum == cents.count())
  }

  test("profile estimates within the error bound of exact quantiles; monotone") {
    val rows = graft.operators.Profile.qsketchProfile(spark, Sf).collect()
    assert(rows.length == 3) // A / N / R
    val exact = graft.core.Tables(spark, Sf).lineitem
      .groupBy("l_returnflag")
      .agg(expr("percentile(CAST(round(l_extendedprice * 100, 0) AS BIGINT), array(0.5, 0.9, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val (flag, p50, p90, p99) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99, s"$flag: estimates not monotone")
      val ex = exact(flag)
      // rank estimate from a ≤3.125%-wide bucket around the true
      // quantile; allow the bound plus the percentile-interpolation
      // wiggle of the exact reference
      Seq(p50 -> ex(0), p90 -> ex(1), p99 -> ex(2)).foreach { case (est, e) =>
        assert(math.abs(est - e) / e <= 0.04,
          s"$flag: estimate $est vs exact $e beyond bound")
      }
    }
  }

  test("sketch is partition-invariant (merge order cannot move a bucket)") {
    val a = graft.operators.Profile.qsketchProfile(spark, Sf).collect().toSeq
    val sp2 = spark.newSession()
    sp2.conf.set("spark.sql.shuffle.partitions", "7")
    val b = graft.operators.Profile.qsketchProfile(sp2, Sf).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("negative input fails fast (operator contract: non-negative measures)") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(5L, -1L).toDF("v").agg(QS.qsketchAgg(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("qsketch_agg is callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT qsketch_agg(id * 37) AS qs FROM range(1000)")
      .head().getSeq[Long](0)
    assert(r.length == QS.NumBuckets && r.sum == 1000L)
  }

  test("SQL qsketch_agg rejects a decimal column at analysis time") {
    // the SQL builder must NOT wrap its input in a silent Long cast:
    // that would truncate decimals to whole units for SQL callers
    // while the DataFrame surface rejects them — the two surfaces
    // share the analysis-time integral-input contract
    GraftFunctions.register(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT qsketch_agg(CAST(id AS DECIMAL(10,2))) FROM range(10)")
        .collect()
    }
    assert(ex.getMessage.contains("integral"),
      s"expected the integral-input analysis error, got: ${ex.getMessage}")
  }
}
