package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Events, Profile, Snapshot, TextOps}

/** Closed-form behavior of the incremental-pipeline wave:
  * snapshot differencing, Markov transitions, readability scoring. */
class IncrementalOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("snapshot_diff: changes partition cleanly and carry the right payload") {
    val rows = Snapshot.snapshotDiff(spark, Sf).collect()
    // the diff is keyed: a key can change at most one way
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val byChange = rows.groupBy(_.getString(1))
    assert(byChange.keySet == Set("insert", "delete", "update"))
    byChange("insert").foreach { r =>
      assert(r.isNullAt(2) && !r.isNullAt(3), "insert = new side only")
    }
    byChange("delete").foreach { r =>
      assert(!r.isNullAt(2) && r.isNullAt(3), "delete = old side only")
    }
    byChange("update").foreach { r =>
      assert(r.getLong(3) - r.getLong(2) == 100L,
        "the carved update is exactly a +1.00 balance bump")
    }
    // churn stays a small fraction of the table — the point of a diff
    val n = spark.read.parquet(s"$Sf/customer.parquet").count()
    assert(rows.length < n / 2, s"diff ${rows.length} rows vs table $n")
  }

  test("snapshot_apply: planted merge folds every change type; untouched keys pass through") {
    import spark.implicits._
    val base = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("c_custkey", "cents")
    val changes = Seq(
      (2L, "update", Some(200L), Some(250L)),
      (3L, "delete", Some(300L), None),
      (4L, "insert", None, Some(400L)),
    ).toDF("c_custkey", "change", "old_cents", "new_cents")
    val got = Snapshot.applyChanges(base, changes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 100L, 2L -> 250L, 4L -> 400L))
  }

  test("snapshot_apply: a contradictory changeset fails fast, not a silent merge") {
    import spark.implicits._
    val base = Seq((1L, 100L)).toDF("c_custkey", "cents")
    def bad(rows: Seq[(Long, String, Option[Long], Option[Long])]) = {
      val ch = rows.toDF("c_custkey", "change", "old_cents", "new_cents")
      intercept[Exception] { Snapshot.applyChanges(base, ch).collect() }
    }
    // replayed insert: key already present
    val e1 = bad(Seq((1L, "insert", None, Some(150L))))
    assert(e1.getMessage.contains("insert for existing key"), e1.getMessage)
    // update/delete against the wrong base version: key absent
    val e2 = bad(Seq((9L, "update", Some(1L), Some(2L))))
    assert(e2.getMessage.contains("for absent key"), e2.getMessage)
    val e3 = bad(Seq((9L, "delete", Some(1L), None)))
    assert(e3.getMessage.contains("for absent key"), e3.getMessage)
    // a key appearing twice in the changeset (misordered replay's
    // update+delete pair) must raise, not fan out duplicate rows
    val e4 = bad(Seq((1L, "update", Some(100L), Some(150L)),
      (1L, "delete", Some(100L), None)))
    assert(e4.getMessage.contains("duplicate changeset rows"), e4.getMessage)
  }

  test("snapshot_apply: applying the carved diff reproduces the carved v2 exactly") {
    val applied = Snapshot.applyDiff(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reconstruct v2 independently: base keys minus deletes,
    // plus inserts, with updates folded — from the diff itself and
    // the raw table, not from applyChanges
    val diff = Snapshot.snapshotDiff(spark, Sf).collect()
    assert(diff.nonEmpty && applied.nonEmpty)
    // every delete key is gone; every insert/update key carries the
    // new value
    diff.foreach { r =>
      r.getString(1) match {
        case "delete" => assert(!applied.contains(r.getLong(0)))
        case "insert" | "update" =>
          assert(applied(r.getLong(0)) == r.getLong(3))
      }
    }
    // |v2| = |v1| + inserts - deletes (untouched keys pass through)
    val nBase = Snapshot.asOf(spark, Sf, v = 1L).count()
    assert(applied.size == nBase +
      diff.count(_.getString(1) == "insert") -
      diff.count(_.getString(1) == "delete"))
  }

  test("scd2: validity intervals cover every transition incl. disappear-then-return") {
    import spark.implicits._
    // (key, ver, cents): stable, update, delete-after-v1, late insert,
    // gap (present v1 and v3 only), update-then-revert
    val rows = Seq(
      (10L, 1, 100L), (10L, 2, 100L), (10L, 3, 100L),
      (20L, 1, 100L), (20L, 2, 200L), (20L, 3, 200L),
      (30L, 1, 100L),
      (40L, 2, 100L), (40L, 3, 100L),
      (50L, 1, 100L), (50L, 3, 100L),
      (60L, 1, 100L), (60L, 2, 200L), (60L, 3, 100L)
    ).toDF("c_custkey", "ver", "cents")
    val got = graft.operators.Snapshot.scd2Fold(rows, maxVer = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (10L, 100L, 1L, -1L, 1),                      // one open run
      (20L, 100L, 1L, 2L, 0), (20L, 200L, 2L, -1L, 1),
      (30L, 100L, 1L, 2L, 0),                       // deleted: closed
      (40L, 100L, 2L, -1L, 1),                      // late insert
      (50L, 100L, 1L, 2L, 0), (50L, 100L, 3L, -1L, 1), // gap closes + reopens
      (60L, 100L, 1L, 2L, 0), (60L, 200L, 2L, 3L, 0),
      (60L, 100L, 3L, -1L, 1)))                     // revert = new run
  }

  test("snapshot_asof: interval reads reconstruct every version of the planted history") {
    import spark.implicits._
    // the same six-transition history as the scd2 spec above
    val rows = Seq(
      (10L, 1, 100L), (10L, 2, 100L), (10L, 3, 100L),
      (20L, 1, 100L), (20L, 2, 200L), (20L, 3, 200L),
      (30L, 1, 100L),
      (40L, 2, 100L), (40L, 3, 100L),
      (50L, 1, 100L), (50L, 3, 100L),
      (60L, 1, 100L), (60L, 2, 200L), (60L, 3, 100L)
    ).toDF("c_custkey", "ver", "cents")
    val hist = graft.operators.Snapshot.scd2Fold(rows, maxVer = 3)
    // round-trip: asOf(fold(versions), v) == version slice v, for EVERY v
    for (v <- 1 to 3) {
      val got = graft.operators.Snapshot.asOfFrom(hist, v).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = rows.filter($"ver" === v).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == want, s"as-of $v: $got != $want")
    }
  }

  test("snapshot_agg_delta: folding the delta equals a full recompute") {
    // the IVM contract, probed inside Spark (the DuckDB gate probes it
    // cross-engine): fold(agg(old), delta) == agg(new), where the
    // expected side here is a FULL RECOMPUTE of the new snapshot —
    // the computation path the incremental refresh exists to avoid
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("cents"),
        pmod(conv(substring(md5(col("c_custkey").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(20L)).as("hv"))
    val expected = cust.filter(col("hv") =!= 1)
      .select(col("c_nationkey"),
        when(col("hv") % 7 === 3, col("cents") + 100)
          .otherwise(col("cents")).as("new_cents"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), sum("new_cents").as("sum_cents"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = Snapshot.aggDelta(spark, Sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, "incremental fold must equal the fresh scan")
    // and the view is keyed + presentation-sorted
    val keys = Snapshot.aggDelta(spark, Sf).collect().map(_.getInt(0))
    assert(keys.sameElements(keys.sorted))
  }

  test("q_nearest_join: planted backward/forward/tie/absent cases pick correctly") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: error at 12:00; purchase 11:00 (1 h back) and 12:30
      // (30 min fwd) — forward is nearer
      (10L, 1L, "purchase", t("2024-01-05 11:00:00")),
      (11L, 1L, "purchase", t("2024-01-05 12:30:00")),
      (12L, 1L, "error", t("2024-01-05 12:00:00")),
      // user 2: equidistant (±10 min) — the EARLIER purchase wins
      (20L, 2L, "purchase", t("2024-01-05 11:50:00")),
      (21L, 2L, "purchase", t("2024-01-05 12:10:00")),
      (22L, 2L, "error", t("2024-01-05 12:00:00")),
      // user 3: only a later purchase — forward-only fallback
      (30L, 3L, "purchase", t("2024-01-05 13:00:00")),
      (31L, 3L, "error", t("2024-01-05 12:00:00")),
      // user 4: no purchases at all — NULLs, row kept
      (40L, 4L, "error", t("2024-01-05 12:00:00")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.qNearestJoinDf(ev).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(12L) == (Some(11L), Some(30L * 60 * 1000000L)))
    assert(got(22L) == (Some(20L), Some(10L * 60 * 1000000L)), "tie must take prev")
    assert(got(31L) == (Some(30L), Some(60L * 60 * 1000000L)))
    assert(got(40L) == (None, None), "purchase-less users keep NULLs")
  }

  test("events_active_users: planted trailing windows, quiet days report 0") {
    import spark.implicits._
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // u1 on days 0 and 2; u2 on day 0; u3 on day 9 — day 1 and 3-8
    // are dau-quiet but WAU/MAU-covered
    val ev = Seq((1L, t(0)), (1L, t(2)), (2L, t(0)), (3L, t(9)))
      .toDF("user_id", "ts")
    val base = ev.select(expr("cast(ts as long) div 86400").as("d")).agg(min("d"))
      .head().getLong(0)
    val got = Events.activeUsersDf(ev).collect()
      .map(r => (r.getLong(0) - base).toInt ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == (0 to 9).toSet, s"days ${got.keySet}")
    assert(got(0) == (2L, 2L, 2L))
    assert(got(1) == (0L, 2L, 2L), "quiet day must appear with dau 0")
    assert(got(2) == (1L, 2L, 2L))
    assert(got(6) == (0L, 2L, 2L), "day-0 users still in the 7-day window")
    assert(got(7) == (0L, 1L, 2L), "day-0 users expire from WAU after 7 days")
    assert(got(8) == (0L, 1L, 2L))
    assert(got(9) == (1L, 1L, 3L), "MAU accumulates all three users by day 9")
  }

  test("events_active_users: a >30-day silent gap still reports every in-span day, and horizons parameterize") {
    import spark.implicits._
    def t(day: Int) = new Timestamp((19000L + day) * 86400000L)
    // activity on day 0 and day 40 only — days 30..39 are outside
    // every trailing window and must still appear as (0,0,0)
    val ev = Seq((1L, t(0)), (2L, t(40))).toDF("user_id", "ts")
    val got = Events.activeUsersDf(ev).collect()
      .map(r => (r.getLong(0) - 19000L).toInt ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == (0 to 40).toSet,
      s"spine must cover the full span: ${got.keySet.toSeq.sorted}")
    (30 to 39).foreach { d =>
      assert(got(d) == (0L, 0L, 0L), s"in-gap day $d must report zeros")
    }
    assert(got(29) == (0L, 0L, 1L) && got(40) == (1L, 1L, 1L))
    // a custom horizon set (here: dau + a 14-day biweekly) matches a
    // brute-force trailing-window recount day for day
    val ev2 = Seq((1L, t(0)), (1L, t(5)), (2L, t(3)), (3L, t(16)), (2L, t(20)))
      .toDF("user_id", "ts")
    val act = Seq(0 -> 1L, 5 -> 1L, 3 -> 2L, 16 -> 3L, 20 -> 2L)
    val brute = (0 to 20).map { d =>
      def users(h: Int) =
        act.filter(p => p._1 <= d && p._1 > d - h).map(_._2).distinct.size.toLong
      d -> (users(1), users(14))
    }.toMap
    val got2 = Events.activeUsersDf(ev2, Seq(1 -> "dau", 14 -> "b14"))
      .collect().map(r => (r.getLong(0) - 19000L).toInt ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got2 == brute, s"14-day horizon mismatch: $got2 vs $brute")
    // misdeclared horizons fail fast
    intercept[IllegalArgumentException] {
      Events.activeUsersDf(ev2, Seq(7 -> "wau", 1 -> "dau"))
    }
  }

  test("q_islands: planted streaks split exactly on missed days") {
    import spark.implicits._
    def t(day: Int) = new Timestamp((19000L + day) * 86400000L)
    // u1 active days {0,1,2, 5, 7,8}; u2 one day; two events on one
    // day must not double-count
    val ev = Seq((1L, t(0)), (1L, t(1)), (1L, t(2)), (1L, t(5)),
      (1L, t(7)), (1L, t(8)), (1L, t(8)), (2L, t(3)))
      .toDF("user_id", "ts")
    val got = Events.islandsDf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1) - 19000L,
        r.getLong(2) - 19000L, r.getLong(3))).toSet
    assert(got == Set((1L, 0L, 2L, 3L), (1L, 5L, 5L, 1L),
      (1L, 7L, 8L, 2L), (2L, 3L, 3L, 1L)), got.toString)
  }

  test("events_stl: a pure weekly pattern decomposes to flat trend, exact seasonal, zero residual") {
    import spark.implicits._
    // one purchase per epoch day e in [19000, 19020], cents = 7000 +
    // 7·(e % 7): any 7 consecutive days cover each weekday once, so
    // the centered window sum is 49000 + 7·21 = 49147 on every inner
    // day -> trend = 7021; seasonal_milli(dow) = 1000·(7000 + 7·dow)
    // - 1000·7021 = 7000·dow - 21000; residual exactly 0
    val ev = (0 to 20).map { d =>
      val e = 19000L + d
      (1L, "purchase", (7000L + 7L * (e % 7)) / 100.0,
        new Timestamp(e * 86400000L))
    }.toDF("user_id", "event_type", "value", "ts")
    val got = Events.stlDf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == (19003L to 19017L).toSeq,
      "inner days only (first/last 3 trimmed)")
    got.foreach { case (day, cents, trend, dow, seas, resid) =>
      assert(cents == 7000L + 7L * (day % 7))
      assert(trend == 7021L, s"day $day trend $trend")
      assert(dow == day % 7)
      assert(seas == 7000L * dow - 21000L, s"dow $dow seasonal $seas")
      assert(resid == 0L, s"day $day residual $resid")
      // the decomposition identity holds by construction — pin it
      assert(1000L * cents == 1000L * trend + seas + resid)
    }
  }

  test("events_anomaly_stl: a planted spike flags; clean weekly days do not") {
    import spark.implicits._
    import graft.operators.{Events => E}
    // the pure weekly pattern (zero residuals) + a +$50 spike on day
    // 10: residual-median stays 0 (a majority of inner days are
    // untouched), so the spike day must flag and days outside the
    // spike's 7-day trend window must not
    def t(day: Int) = new Timestamp((19000L + day) * 86400000L)
    val ev = (0 to 20).map { d =>
      val e = 19000L + d
      val cents = 7000L + 7L * (e % 7) + (if (d == 10) 5000L else 0L)
      (1L, "purchase", cents / 100.0, t(d))
    }.toDF("user_id", "event_type", "value", "ts")
    // drive the gated query's own logic over a temp dir layout: write
    // the events as the only input the operator reads
    val dir = java.nio.file.Files.createTempDirectory("graft_astl").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = E.eventsAnomalyStl(spark, dir).collect()
      .map(r => (r.getLong(0) - 19000L).toInt -> r.getBoolean(5)).toMap
    assert(got.keySet == (3 to 17).toSet)
    assert(got(10), "the spiked day must flag")
    ((3 to 6) ++ (14 to 17)).foreach { d =>
      assert(!got(d), s"clean day $d outside the spike window flagged")
    }
  }

  test("events_ltv: conserves revenue, cumulates exactly, stays consistent with retention") {
    val rows = Events.eventsLtv(spark, Sf).collect()
    val ev = graft.core.Tables(spark, Sf).events
    // revenue conservation: Σ rev_cents = total purchase cents
    val total = ev.filter(col("event_type") === "purchase")
      .select(round(col("value") * 100, 0).cast("long").as("c"))
      .agg(sum("c")).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == total)
    // per-cohort cumulation replays exactly; ltv = cum div size
    rows.groupBy(_.getTimestamp(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(3)
        assert(r.getLong(4) == cum, "cumulative revenue mismatch")
        assert(r.getLong(6) == cum / r.getLong(5), "ltv != cum div size")
      }
    }
    // cohort cells agree with retention: buyers on a (cohort, offset)
    // cell never exceed that cell's active users
    val ret = Events.qRetention(spark, Sf).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val active = ret.getOrElse((r.getTimestamp(0), r.getInt(1)), 0L)
      assert(r.getLong(2) <= active,
        s"cell ${r.getTimestamp(0)}+${r.getInt(1)}: buyers ${r.getLong(2)} > active $active")
    }
  }

  test("events_seasonality: partitions days/events; indexes average to unity") {
    val rows = Events.eventsSeasonality(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 7L).toSet))
    val ev = graft.core.Tables(spark, Sf).events
    assert(rows.map(_.getLong(2)).sum == ev.count())
    val nDays = ev.select(expr("cast(ts as long) div 86400")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nDays)
    // day-weighted mean of the index is 1e6 up to per-row rounding
    val dd = rows.map(_.getLong(1)).sum
    val wmean = rows.map(r => r.getLong(1) * r.getLong(3)).sum.toDouble / dd
    assert(math.abs(wmean - 1e6) < 1, s"weighted mean index $wmean")
  }

  test("markov: transitions conserve mass and probabilities are exact ppm") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: a->b->a->c   user 2: b->b
    val ev = Seq(
      (1L, ts(0), 10L, "a"), (1L, ts(1), 11L, "b"),
      (1L, ts(2), 12L, "a"), (1L, ts(3), 13L, "c"),
      (2L, ts(0), 20L, "b"), (2L, ts(5), 21L, "b"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.markovDf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 500000L)),  // a leaves twice: ->b, ->c
      ("a", "c") -> ((1L, 500000L)),
      ("b", "a") -> ((1L, 500000L)),  // b leaves twice: ->a, ->b
      ("b", "b") -> ((1L, 500000L)),
    ))
    // total transitions = total events minus one per active user
    val full = Events.qMarkov(spark, Sf)
      .agg(sum("n")).as[Long].head()
    val evs = spark.read.parquet(s"$Sf/events.parquet")
    val expected = evs.count() -
      evs.select(countDistinct("user_id")).as[Long].head()
    assert(full == expected, "every adjacent pair is counted exactly once")
  }

  test("markov: per-state probabilities sum to 1e6 minus floor loss") {
    val bad = Events.qMarkov(spark, Sf)
      .groupBy("from_type")
      .agg(sum("p_ppm").as("p"), count(lit(1)).as("k"))
      // floor division loses < 1 ppm per outgoing edge
      .filter(col("p") > 1000000L || col("p") <= lit(1000000L) - col("k"))
    assert(bad.isEmpty, "ppm must sum to 1e6 within the floor-loss bound")
  }

  test("changepoint: CUSUM argmax lands on the planted regime shift") {
    // pinned UTC instants, NOT Timestamp.valueOf: valueOf parses in
    // the JVM default zone, so under a non-UTC JVM (the hostile-env
    // gate runs Asia/Kolkata) the expected midnight literal lands on
    // a different instant than the session's UTC day truncation
    def utc(s: String) = Timestamp.from(java.time.Instant.parse(s))
    def ts(d: Int) = utc(f"2024-01-$d%02dT10:00:00Z")
    // type "a": daily counts 1,1,1,9,9,9 — the shift is after day 3
    val counts = Seq(1, 1, 1, 9, 9, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, j) =>
      (0 until c).map(k => ((j * 100 + k).toLong, ts(j + 1), 1L, "a"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type")
    val r = Events.changepointDf(ev).collect()
    assert(r.length == 1)
    val row = r.head
    // D_3 = 6*3 - 3*30 = -72 is the max deviation; split_day is the
    // calendar day (midnight truncation)
    assert(row.getTimestamp(1) == utc("2024-01-03T00:00:00Z")
      && row.getLong(2) == 6L && row.getLong(3) == 72L)
    assert(row.getLong(4) == 1000L, "mean before = 1.000 events/day")
    assert(row.getLong(5) == 9000L, "mean after = 9.000 events/day")
  }

  test("skew profile: planted hot key yields the closed-form ratios") {
    import spark.implicits._
    // one key taking half the rows among 51 distinct: hot share is
    // exactly 50%, skew ratio 25.5× uniform
    val melted = ((1 to 50).map(_ => 0L) ++ (1L to 50L))
      .map(k => ("hot", k)).toDF("key_col", "k")
      .unionAll(
        // a perfectly uniform column: ratio lands exactly on 1e6
        (1L to 100L).map(k => ("uni", k)).toDF("key_col", "k"))
    val got = Profile.skewFold(melted).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("hot") == ((100L, 51L, 50L, 500000L, 25500000L)))
    assert(got("uni") == ((100L, 100L, 1L, 10000L, 1000000L)))
    // corpus invariant: skew ratio can never fall below uniform
    // (max_cnt >= avg ⇒ max·distinct >= total ⇒ ppm >= 1e6)
    Profile.skewProfile(spark, Sf).collect().foreach { r =>
      assert(r.getLong(5) >= 1000000L, s"sub-uniform skew ratio: $r")
    }
  }

  test("fd profile: holds is exactly the n_pairs == n_lhs case") {
    val rows = Profile.fdProfile(spark, Sf).collect()
    assert(rows.length == Profile.FdPairs.length)
    rows.foreach { r =>
      val (nLhs, nPairs, holds) = (r.getLong(2), r.getLong(3), r.getInt(4))
      assert(nPairs >= nLhs, "each lhs value maps to at least one rhs")
      assert((holds == 1) == (nPairs == nLhs), s"holds inconsistent: $r")
    }
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r.getInt(4)).toMap
    assert(byPair(("o_orderkey", "o_custkey")) == 1, "orderkey is a key")
    assert(byPair(("o_orderstatus", "o_orderpriority")) == 0)
  }

  test("paths: first-3 journey openings count users, order-exact") {
    val total = Events.qPaths(spark, Sf, k = 1000)
      .agg(sum("n_users")).as[Long].head()
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select(countDistinct("user_id")).as[Long].head()
    assert(total == users, "every user contributes exactly one path")
    val top = Events.qPaths(spark, Sf).collect()
    assert(top.length <= 20 && top.nonEmpty)
    // descending counts with path tie-break — a total order
    top.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) &&
          a.getString(0) < b.getString(0)))
    case _ => ()
    }
  }

  test("rfm: composite code is exactly the three band scores") {
    val rows = Events.qRfm(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rd, f, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (rs, fs, ms, rfm) =
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7))
      assert(rd >= 0 && Seq(rs, fs, ms).forall(s => s >= 1 && s <= 5))
      assert(rfm == rs * 100 + fs * 10 + ms)
      if (rd == 0) assert(rs == 5)
      if (f >= 20) assert(fs == 5)
      if (m >= 100000) assert(ms == 5)
    }
  }

  test("mad profile: dispersion is non-negative and median sits in range") {
    val rows = Profile.madProfile(spark, Sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) >= 0.0, "MAD is a distance")
    }
    // discount values live in [0, 0.1]: its MAD must be tiny, while
    // extendedprice disperses by hundreds — robust scale separation
    val byCol = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byCol("l_discount") < 1.0 && byCol("l_extendedprice") > 100.0)
  }

  test("collocations: closed-form micro-nat PMI on a two-word corpus") {
    val docs = Seq((1L, "x y x y x y x y x y")).toDF("doc_id", "text")
    val rows = TextOps.collocationsDf(docs, minCount = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // unigrams x:5 y:5 (N1=10); bigrams "x y":5 "y x":4 (N2=9)
    // pmi_micro = L(c2) - L(9) - L(5) - L(5) + 2 L(10), L = round(ln*1e6)
    assert(rows.toSeq == Seq(("x y", 5L, 798507L), ("y x", 4L, 575363L)))
  }

  test("readability: closed-form Flesch fixed-point on a known sentence") {
    val docs = Seq((1L, "Hello world. Go!"), (2L, ""), (3L, "pfft"))
      .toDF("doc_id", "text")
    val r = TextOps.textReadabilityDf(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(6))).toMap
    // 2 sentence runs ('.' and '!'), 3 words, 4 vowel groups
    // flesch_milli = 206835 - 1015*3/2 - 84600*4/3 = 206835 - 1522 - 112800
    assert(r(1L) == ((2L, 3L, 4L, 92513L)))
    // degenerate docs still score: 1 sentence floor, 1 empty token
    assert(r(2L)._1 == 1L && r(2L)._2 == 1L && r(2L)._3 == 0L)
    // no vowels: syllables 0, score = 206835 - 1015 - 0
    assert(r(3L) == ((1L, 1L, 0L, 205820L)))
  }
}
