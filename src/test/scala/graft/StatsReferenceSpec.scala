package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, Profile}

/** Independent in-memory reference folds for the r11 statistics
  * operators — the cross-check tier beyond the one-corpus DuckDB
  * gate: each operator's distributed formulation is replayed as a
  * plain Scala fold over the collected sf0.001 events, and the
  * SEMANTIC identities the formulas encode (CCF(0) = Pearson r of
  * the two filled series; survival's telescoped K-M = the empirical
  * tail distribution; χ² cell sums reconstruct the textbook
  * (O−E)²/E within quantization) are asserted directly. */
class StatsReferenceSpec extends SparkSpecBase {

  private lazy val evs = spark.read.parquet(s"$Sf/events.parquet")
    .select(col("event_type"), expr("cast(ts as long) div 86400").as("day"),
      col("value"), col("user_id"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("ccf(0) equals the Pearson correlation of the shared filled series") {
    val purch = evs.filter(_._1 == "purchase")
      .groupBy(_._2).map { case (d, g) =>
        d -> g.map(e => math.round(e._3 * 100)).sum }
    val clicks = evs.filter(_._1 == "click")
      .groupBy(_._2).map { case (d, g) => d -> g.size.toLong }
    val days = (purch.keys ++ clicks.keys).toSeq
    val (dmin, dmax) = (days.min, days.max)
    val xs = (dmin to dmax).map(d => purch.getOrElse(d, 0L).toDouble)
    val ys = (dmin to dmax).map(d => clicks.getOrElse(d, 0L).toDouble)
    val mx = xs.sum / xs.length
    val my = ys.sum / ys.length
    val r = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    val got = Events.eventsCcf(spark, Sf).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    assert(math.abs(got(0L) - r) < 2e-6, s"ccf(0)=${got(0L)} pearson=$r")
    // and every lag obeys |ccf| <= 1 with the full ±7 spine present
    assert(got.keySet == (-7L to 7L).toSet)
  }

  test("survival curve equals the in-memory lifetime tail distribution") {
    val durs = evs.groupBy(_._4).map { case (_, g) =>
      g.map(_._2).max - g.map(_._2).min }.toSeq
    val total = durs.length.toLong
    val got = Events.eventsSurvival(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (0L to durs.max))
    got.foreach { case (t, nRisk, nChurn, ppm) =>
      assert(nRisk == durs.count(_ >= t).toLong, s"t=$t n_risk")
      assert(nChurn == durs.count(_ == t).toLong, s"t=$t n_churn")
      assert(ppm == nRisk * 1000000L / total, s"t=$t ppm")
    }
    // curve boundary identities: S(0) = 1, monotone non-increasing
    assert(got.head._4 == 1000000L)
    got.sliding(2).foreach { case Array(a, b) => assert(b._2 <= a._2) }
  }

  test("chi2 cells reconstruct the textbook statistic within quantization") {
    val cells = evs.groupBy(e => (e._1, e._2 % 7))
      .map { case (k, g) => k -> g.size.toLong }
    val rows = cells.groupBy(_._1._1).map { case (t, g) => t -> g.values.sum }
    val cols = cells.groupBy(_._1._2).map { case (d, g) => d -> g.values.sum }
    val n = cells.values.sum
    val got = Profile.profileChi2(spark, Sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    var refTotal = 0.0
    cells.foreach { case ((t, d), o) =>
      val (r_, c_) = (rows(t), cols(d))
      val e = r_.toDouble * c_ / n
      val chi = (o - e) * (o - e) / e
      refTotal += chi
      val (gObs, gE, gChi) = got((t, d))
      assert(gObs == o)
      // integer micro-units vs float reference: within 1 micro-unit
      // of quantization per cell
      assert(math.abs(gE / 1e6 - e) < 2e-6 * math.max(e, 1.0), s"cell ($t,$d) E")
      assert(math.abs(gChi / 1e6 - chi) < 1e-3, s"cell ($t,$d) chi2")
    }
    val (tObs, _, tChi) = got(("__total__", -1L))
    assert(tObs == n)
    assert(math.abs(tChi / 1e6 - refTotal) < 1e-2,
      s"total ${tChi / 1e6} vs $refTotal")
  }

  test("holt-winters fitted values: seasonality phases in after the first week") {
    val hw = Events.eventsHoltWinters(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // first row: level = y0, seasonal = 0 (declared init)
    assert(hw.head._3 == hw.head._2 && hw.head._5 == 0L)
    // seasonal register holds zeros through the first 7 lags only in
    // the lag READ; written seasonals may be nonzero from day 1
    // forecast identity: forecast_hw row h equals l_T + h*b_T + s_{T+h-7}
    val f = Events.eventsForecastHw(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    val (lT, bT) = (hw.last._3, hw.last._4)
    val byDay = hw.map(r => r._1 -> r._5).toMap
    val dmax = hw.last._1
    for (h <- 1L to 7L)
      assert(f(h) == lT + h * bT + byDay(dmax + h - 7),
        s"h=$h forecast identity")
  }
}
