package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q217: OHLC invariants — low <= open, close <= high on every bar; " +
    "bar count equals distinct (event_type, hour) pairs") {
    val bars = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir).cache()
    try {
      val bad = bars.filter(
        col("low") > col("open") || col("low") > col("close") ||
          col("high") < col("open") || col("high") < col("close") ||
          col("n_events") < 1).count()
      assert(bad === 0)
      val distinctBars = Tables.events(spark, sfDir)
        .select(col("event_type"), date_trunc("hour", col("ts"))).distinct().count()
      assert(bars.count() === distinctBars)
    } finally bars.unpersist()
  }

  test("q217: single-event bars have open = high = low = close") {
    val bad = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir)
      .filter(col("n_events") === 1)
      .filter(col("open") =!= col("close") || col("high") =!= col("low") ||
        col("open") =!= col("high")).count()
    assert(bad === 0)
  }

  test("q217: plan is one hash-aggregation — no window operator, no join") {
    val plan = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "OHLC must not use window functions")
    assert(!plan.toLowerCase.contains("join"), "OHLC must not join")
  }

  test("q221: every reported bucket actually violates the 2x seasonal band " +
    "(driver-side recount)") {
    val rows = SparkEntry.queries("q221_seasonal_anomaly")(spark, sfDir)
      .select("event_type", "bar_ts", "n", "total_hod", "n_days", "verdict")
      .collect()
    assert(rows.nonEmpty, "fixture should contain seasonal outliers")
    rows.foreach { r =>
      val (n, tot, d) = (r.getAs[Long]("n"), r.getAs[Long]("total_hod"),
        r.getAs[Long]("n_days"))
      val v = r.getAs[String]("verdict")
      if (v == "high") assert(n * d > tot * 2)
      else { assert(v == "low"); assert(n * d * 2 < tot) }
    }
    // independent recount of one flagged cell's baseline
    val r0 = rows.head
    val ev = Tables.events(spark, sfDir)
    val hodOf = spark.sql(
      s"SELECT hour(TIMESTAMP '${r0.getAs[java.sql.Timestamp]("bar_ts")}')")
      .as[Int].head
    val tot0 = ev.filter(col("event_type") === r0.getAs[String]("event_type"))
      .filter(hour(col("ts")) === hodOf).count()
    assert(tot0 === r0.getAs[Long]("total_hod"))
  }

  test("q223: gap hours + observed hours tile the spine exactly, per type, " +
    "and runs are maximal (no two adjacent runs)") {
    val ev = Tables.events(spark, sfDir)
    val span = ev.agg(
      (expr("unix_timestamp(date_trunc('hour', max(ts)))") -
        expr("unix_timestamp(date_trunc('hour', min(ts)))")).as("s"))
      .as[Long].head / 3600 + 1
    val present = ev.groupBy(col("event_type"))
      .agg(countDistinct(date_trunc("hour", col("ts"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val runs = SparkEntry.queries("q223_calendar_gap_runs")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("gap_start"),
        r.getAs[java.sql.Timestamp]("gap_end"), r.getAs[Long]("n_hours")))
    val gapsByType = runs.groupBy(_._1)
    present.keys.foreach { t =>
      val gapHours = gapsByType.get(t).map(_.map(_._4).sum).getOrElse(0L)
      assert(gapHours + present(t) === span,
        s"$t: gaps $gapHours + present ${present(t)} != spine $span")
    }
    // maximality: consecutive runs of a type are separated by >= 1
    // observed hour
    gapsByType.values.foreach { rs =>
      rs.sortBy(_._2.getTime).sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.getTime - a._3.getTime > 3600 * 1000L,
            s"adjacent runs should have merged: $a / $b")
        case _ =>
      }
    }
    // run length is consistent with its endpoints
    runs.foreach { case (_, s, e, n) =>
      assert((e.getTime - s.getTime) / (3600 * 1000L) + 1 === n)
    }
  }

  test("q228: dispersion matches a driver-side exact recompute per type") {
    val rows = SparkEntry.queries("q228_dispersion_index")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("c")).collect()
      .groupMap(_.getString(0))(_.getLong(1))
    rows.foreach { r =>
      val cs = counts(r.getAs[String]("event_type"))
      val (n, s, s2) = (BigInt(cs.size), BigInt(cs.sum),
        BigInt(cs.map(c => c * c).sum))
      assert(r.getAs[Long]("n_bars") === n.toLong)
      assert(r.getAs[Long]("sum_c") === s.toLong)
      assert(r.getAs[Long]("sum_c2") === s2.toLong)
      assert(r.getAs[Long]("dispersion_ppm") ===
        ((n * s2 - s * s) * 1000000 / (n * s)).toLong)
    }
  }

  test("q237: the CUSUM fold matches a driver-side sequential recompute") {
    val rows = SparkEntry.queries("q237_cusum_drift")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = daily(t).map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1)
      val n = series.length.toLong
      val total = series.map(_._2).sum
      val slack = total / 4
      var s = 0L; var mx = 0L; var cross: Option[Long] = None
      series.foreach { case (day, c) =>
        s = math.max(0L, s + n * c - total - slack)
        mx = math.max(mx, s)
        if (cross.isEmpty && s > 2 * total) cross = Some(day)
      }
      assert(r.getAs[Long]("n_days") === n)
      assert(r.getAs[Long]("max_cusum_scaled") === mx, s"type $t")
      assert(r.getAs[Boolean]("crossed") === (mx > 2 * total))
      assert(Option(r.getAs[java.lang.Long]("first_cross_day"))
        .map(_.toLong) === cross)
    }
  }

  test("q244: HHI stays inside [1/n_types, 1] and the dominant share is " +
    "at least the even share") {
    val rows = SparkEntry.queries("q244_hhi_mix")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, hhi, share) = (r.getAs[Long]("n_types"),
        r.getAs[Long]("hhi_ppm"), r.getAs[Long]("dominant_share_ppm"))
      assert(hhi >= 1000000L / nt - 1 && hhi <= 1000000L)
      assert(share >= 1000000L / nt - 1 && share <= 1000000L)
      // HHI can never exceed the dominant share (sum of squared shares
      // <= max share when shares sum to 1)
      assert(hhi <= share + 1)
    }
    // recount one day driver-side
    val r0 = rows.head
    val day0 = r0.getAs[Long]("day")
    val cs = Tables.events(spark, sfDir)
      .filter(expr("unix_micros(date_trunc('DAY', ts)) div 86400000000") === day0)
      .groupBy(col("event_type")).agg(count(lit(1))).collect()
      .map(_.getLong(1))
    val n = cs.sum
    assert(r0.getAs[Long]("n_events") === n)
    assert(r0.getAs[Long]("hhi_ppm") ===
      (cs.map(c => BigInt(c) * c).sum * 1000000 / (BigInt(n) * n)).toLong)
  }

  test("q256: the greedy replay matches a driver-side sequential " +
    "simulation day by day") {
    val rows = SparkEntry.queries("q256_bandit_replay")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("chosen_arm"),
        r.getAs[Long]("mean_prev_scaled"), r.getAs[Long]("reward_scaled")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val days = daily.map(_._2).distinct.sorted
    val cum = scala.collection.mutable.Map.empty[String, (BigInt, BigInt)]
    val expected = days.map { d =>
      val today = daily.filter(_._2 == d)
      val cells = today.map { case (t, _, _, _) =>
        val mp = cum.get(t) match {
          case Some((cn, cs)) => (cs * 1000000 / cn).toLong
          case None => -1L
        }
        (mp, t)
      }
      val (mp, arm) = cells.max
      val (_, _, n, s) = today.find(_._1 == arm).get
      val reward = (BigInt(s) * 1000000 / n).toLong
      today.foreach { case (t, _, n0, s0) =>
        val (cn, cs) = cum.getOrElse(t, (BigInt(0), BigInt(0)))
        cum(t) = (cn + n0, cs + s0)
      }
      (d, arm, mp, reward)
    }
    assert(rows.toSeq === expected.toSeq)
  }

  test("q259: every flagged pair really is a same-type repeat within 60s, " +
    "and the flag count matches a driver recount") {
    val rows = SparkEntry.queries("q259_event_doublefire")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_us") >= 0L &&
        r.getAs[Long]("gap_us") < 60000000L)
    }
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expect = ev.values.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).toSeq.sliding(2).collect {
        case Seq(a, b) if a._3 == b._3 && b._4 - a._4 < 60000000L => b._2
      }
    }.toSet
    assert(rows.map(_.getAs[Long]("dup_event_id")).toSet === expect)
  }

  test("q261: stickiness is bounded by 1, DAU <= MAU everywhere, and the " +
    "first day's MAU equals its DAU") {
    val rows = SparkEntry.queries("q261_dau_mau")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("dau"),
        r.getAs[Long]("mau"), r.getAs[Long]("stickiness_ppm")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, mau, s) =>
      assert(dau >= 1L && dau <= mau, s"day $d")
      assert(s === dau * 1000000L / mau)
      assert(s <= 1000000L)
    }
    // day 1's trailing window contains only day 1
    assert(rows.head._2 === rows.head._3)
    // a full-window day's MAU is the exact distinct of its 28 days
    val (d28, _, mau28, _) = rows.last
    val manual = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"))
      .filter(col("day") >= d28 - 27 && col("day") <= d28)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(mau28 === manual)
  }

  test("q279: cohort week retains 100% at offset 0, retention never " +
    "exceeds cohort size, and a driver recount agrees") {
    import graft.queries.TimeSeriesQueries
    val rows = TimeSeriesQueries.q279CohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
      if (r.getAs[Long]("week_offset") == 0L)
        assert(r.getAs[Long]("retention_ppm") === 1000000L,
          "a user is active in their own cohort week by definition")
    }
    assert(rows.exists(_.getAs[Long]("week_offset") > 0L),
      "no multi-week activity - matrix is vacuous")
    // recount one cell: (first cohort, max offset)
    val target = rows.maxBy(r =>
      (r.getAs[Long]("week_offset"), -r.getAs[java.sql.Timestamp]("cohort_wk").getTime))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct().as[(Long, java.sql.Timestamp)].collect()
    val firstWk = ev.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2.getTime).min }
    val cwk = target.getAs[java.sql.Timestamp]("cohort_wk").getTime
    val k = target.getAs[Long]("week_offset")
    val weekMs = 7L * 86400000L
    val active = ev.count { case (u, w) =>
      firstWk(u) == cwk && (w.getTime - cwk) / weekMs == k }
    assert(target.getAs[Long]("n_active") === active)
  }

  test("q283: OLS sums recount exactly driver-side and the slope is the " +
    "truncated rational") {
    import graft.queries.TimeSeriesQueries
    val rows = TimeSeriesQueries.q283TrendSlope(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
    val us0 = raw.map(_._2).min
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val pts = raw.filter(_._1 == t)
        .map { case (_, us, c) => ((us - us0) / 3600000000L, c) }
      val n = BigInt(pts.length)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      assert(BigInt(r.getAs[Long]("sum_x")) === sx, t)
      assert(BigInt(r.getAs[Long]("sum_xy")) === sxy, t)
      val num = (n * sxy - sx * sy) * 1000
      val den = n * sxx - sx * sx
      assert(den > 0, s"$t: degenerate x spread")
      // BigInt / truncates toward zero for the signs we produce either way
      assert(BigInt(r.getAs[Long]("slope_millicents_per_hour")) === num / den, t)
    }
  }

  test("q292: session counts are monotone in the gap, bounded by users " +
    "and events, and one threshold replays driver-side") {
    import graft.queries.TimeSeriesQueries
    val rows = TimeSeriesQueries.q292SessionGapSensitivity(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("gap_seconds"))
    assert(rows.map(_.getAs[Long]("gap_seconds")).toSeq ===
      Seq(900L, 1800L, 3600L))
    val nUsers = rows.head.getAs[Long]("n_users")
    val sessions = rows.map(_.getAs[Long]("n_sessions"))
    // a larger gap can only merge sessions, never split them
    assert(sessions(0) >= sessions(1) && sessions(1) >= sessions(2))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= nUsers)
      assert(r.getAs[Long]("n_single_event") <= r.getAs[Long]("n_sessions"))
    }
    // driver replay of the 1800 s cut
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"))
      .as[(Long, Long, Long)].collect()
    val manual = ev.groupBy(_._1).map { case (_, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > 1800L * 1000000L }
    }.sum
    assert(rows(1).getAs[Long]("n_sessions") === manual.toLong)
  }

  test("q299: life-table invariants — at_risk telescopes exactly, " +
    "every exit is churned or censored, offset 0 covers everyone") {
    val rows = SparkEntry.queries("q299_life_table")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("day_offset"))
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("day_offset") === 0L)
    assert(rows.head.getAs[Long]("at_risk") === users,
      "everyone is at risk at their own first day")
    rows.foreach { r =>
      val (ar, ch, ce) = (r.getAs[Long]("at_risk"),
        r.getAs[Long]("churned"), r.getAs[Long]("censored"))
      assert(ch + ce <= ar)
      assert(r.getAs[Long]("hazard_ppm") === ch * 1000000L / ar)
    }
    // telescoping: the next row's risk set is exactly this row's minus
    // its exits (holds across offset gaps too - an absent offset means
    // no user ended there)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("at_risk") === a.getAs[Long]("at_risk") -
          a.getAs[Long]("churned") - a.getAs[Long]("censored"))
      case _ =>
    }
    // all exits accounted: Σ(churned + censored) = user count
    assert(rows.map(r => r.getAs[Long]("churned") +
      r.getAs[Long]("censored")).sum === users)
  }

  test("q303: boundary conservation and a full driver-side sweep replay") {
    val rows = graft.queries.TimeSeriesQueries.q303PeakConcurrency(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // microsecond precision: getTime is ms-truncated and would reorder
    // boundaries that differ only in sub-ms digits
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val sess = graft.streaming.StreamingOps
      .sessionAgg(graft.Tables.events(spark, sfDir))
      .select(col("s_start"), col("s_end")).collect()
      .map(r => (micros(r.getTimestamp(0)), micros(r.getTimestamp(1))))
    // every session contributes exactly one start and one end boundary
    assert(rows.map(_.getAs[Long]("n_starts")).sum === sess.length.toLong)
    assert(rows.map(_.getAs[Long]("n_ends")).sum === sess.length.toLong)
    // replay the sweep in memory: (ts, delta) order, delta asc so an end
    // and a start at the same instant do not overlap (half-open)
    val bounds = sess.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy(identity)
    var level = 0L
    val byDay = scala.collection.mutable.Map.empty[String, (Long, Long)]
    bounds.foreach { case (ts, d) =>
      level += d
      val day = java.time.Instant.ofEpochSecond(ts / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      val (peak, _) = byDay.getOrElse(day, (Long.MinValue, 0L))
      if (level > peak) byDay(day) = (level, ts)
    }
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      val (peak, at) = byDay(day)
      assert(r.getAs[Long]("peak_concurrency") === peak, s"day $day peak")
      assert(micros(r.getAs[java.sql.Timestamp]("peak_ts")) === at,
        s"day $day peak_ts")
      assert(peak >= 1L)
    }
    assert(rows.length === byDay.size)
  }

  /** Driver-side daily cents series per event type over the dense
    * calendar spine — the reference both backtest specs replay against. */
  private def dailySeries(): Map[String, Array[Long]] = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val n = java.time.temporal.ChronoUnit.DAYS.between(d0, d1).toInt + 1
    ev.groupBy(_._1).map { case (t, rs) =>
      val arr = Array.fill(n)(0L)
      rs.foreach { case (_, d, c) =>
        arr(java.time.temporal.ChronoUnit.DAYS.between(d0, d).toInt) += c
      }
      t -> arr
    }
  }

  test("q312: MASE replays from a driver-side seasonal-naive backtest " +
    "on the dense calendar series") {
    val series = dailySeries()
    val rows = SparkEntry.queries("q312_mase_backtest")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length === series.size)
    rows.foreach { r =>
      val xs = series(r.getAs[String]("event_type"))
      val n = xs.length
      assert(r.getAs[Long]("n_days") === n.toLong)
      val err = (n - 7 until n).map(t => math.abs(xs(t) - xs(t - 7))).sum
      val naive = (1 until n - 7).map(t => math.abs(xs(t) - xs(t - 1))).sum
      assert(r.getAs[Long]("sum_abs_err") === err)
      assert(r.getAs[Long]("sum_abs_naive") === naive)
      assert(r.getAs[Long]("n_train_diffs") === (n - 8).toLong)
      if (naive == 0) assert(r.isNullAt(r.fieldIndex("mase_ppm")))
      else assert(r.getAs[Long]("mase_ppm") ===
        (BigInt(err) * (n - 8) * 1000000 / (BigInt(7) * naive)).toLong)
    }
  }

  test("q314: cross-correlation laws — corr2 bounded by 1e6, lag-0 " +
    "symmetry across the pair flip, and one pair replays driver-side") {
    val series = dailySeries()
    val rows = SparkEntry.queries("q314_leadlag_xcorr")(spark, sfDir)
      .collect()
    val types = series.keySet.toSeq.sorted
    assert(rows.length === types.size * (types.size - 1) * 4)
    val byKey = rows.map(r => ((r.getAs[String]("type_a"),
      r.getAs[String]("type_b"), r.getAs[Long]("lag")), r)).toMap
    rows.foreach { r =>
      Option(r.getAs[Any]("corr2_ppm")).foreach(v =>
        assert(v.asInstanceOf[Long] <= 1000000L, s"corr2 > 1: $r"))
    }
    // lag 0 is symmetric in the pair
    for (a <- types; b <- types if a != b) {
      val ab = byKey((a, b, 0L)); val ba = byKey((b, a, 0L))
      assert(ab.getAs[Long]("corr_sign") === ba.getAs[Long]("corr_sign"))
      assert(Option(ab.getAs[Any]("corr2_ppm")) ===
        Option(ba.getAs[Any]("corr2_ppm")))
    }
    // replay (types(0), types(1), lag 1) driver-side
    val (ta, tb) = (types(0), types(1))
    val (xs, ys) = (series(ta), series(tb))
    val n = xs.length - 1
    val pairs = (0 until n).map(t => (BigInt(xs(t)), BigInt(ys(t + 1))))
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
    val r = byKey((ta, tb, 1L))
    assert(r.getAs[Long]("n") === n.toLong)
    assert(r.getAs[Long]("corr_sign") === num.signum.toLong)
    if (dx != 0 && dy != 0)
      assert(r.getAs[Long]("corr2_ppm") ===
        (num * num * 1000000 / (dx * dy)).toLong)
  }

  test("q315: DAU never exceeds MAU, stickiness bounded by 1e6, and the " +
    "last day's trailing-28 membership replays driver-side") {
    val rows = SparkEntry.queries("q315_dau_mau")(spark, sfDir)
      .collect().sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("mau28"), s"dau > mau: $r")
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
      assert(r.getAs[Long]("stickiness_ppm") ===
        r.getAs[Long]("dau") * 1000000L / r.getAs[Long]("mau28"))
    }
    val active = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val lastDay = rows.last.getAs[java.sql.Date]("day").toLocalDate
    val mau = active.filter { case (_, d) =>
      val gap = java.time.temporal.ChronoUnit.DAYS.between(d, lastDay)
      gap >= 0 && gap <= 27
    }.map(_._1).distinct.length
    assert(rows.last.getAs[Long]("mau28") === mau.toLong)
    val dau = active.count(_._2 == lastDay)
    assert(rows.last.getAs[Long]("dau") === dau.toLong)
  }

  test("q321: streak marginals reconcile - peak counts cover every user, " +
    "length-weighted streaks cover every active day, and one user's " +
    "streak set replays driver-side") {
    val rows = SparkEntry.queries("q321_streak_histogram")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val active = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val nUsers = active.map(_._1).distinct.length.toLong
    assert(rows.map(_.getAs[Long]("n_users_peak")).sum === nUsers)
    assert(rows.map(r => r.getAs[Long]("len") * r.getAs[Long]("n_streaks"))
      .sum === active.length.toLong)
    // replay one user's streaks
    val uid = active.head._1
    val days = active.filter(_._1 == uid).map(_._2).sortBy(_.toEpochDay)
    val streaks = days.foldLeft(List.empty[List[java.time.LocalDate]]) {
      case (acc, d) => acc match {
        case (h :: t) :: rest if h.plusDays(1) == d => (d :: h :: t) :: rest
        case _ => List(d) :: acc
      }
    }.map(_.length.toLong)
    val myPeak = streaks.max
    // the histogram must contain this user's peak bucket
    assert(rows.exists(r => r.getAs[Long]("len") == myPeak &&
      r.getAs[Long]("n_users_peak") >= 1L))
  }

  test("q323: Theil-Sen pair count is C(n_days,2) and the lower-median " +
    "slope replays driver-side per event_type") {
    val rows = SparkEntry.queries("q323_theil_sen")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == et)
      val d = series.length.toLong
      assert(r.getAs[Long]("n_days") === d)
      assert(r.getAs[Long]("n_pairs") === d * (d - 1) / 2)
      val slopes = (for {
        (_, d1, c1) <- series; (_, d2, c2) <- series if d2 > d1
      } yield (c2 - c1, d2 - d1)).sortBy { case (num, den) =>
        (num.toDouble / den, num, den)
      }
      val (mn, md) = slopes(((slopes.length + 1) / 2) - 1)
      assert(r.getAs[Long]("med_num") === mn, s"med_num mismatch for $et")
      assert(r.getAs[Long]("med_den") === md, s"med_den mismatch for $et")
    }
  }

  test("q329: split partitions the day axis, and the best split replays " +
    "driver-side from daily counts") {
    val rows = SparkEntry.queries("q329_changepoint")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    rows.foreach { r =>
      val et = r.getString(0)
      val nDays = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") === nDays)
      val series = daily.filter(_._1 == et).sortBy(_._2.toEpochDay)
      assert(series.length.toLong === nDays)
      def a(seg: Seq[Long]): BigInt = {
        val s1 = seg.map(BigInt(_)).sum
        BigInt(seg.length) * seg.map(x => BigInt(x) * x).sum - s1 * s1
      }
      // replay the argmin over every split with the same cost ordering
      val best = (1 until series.length).map { i =>
        val (l, rr) = series.map(_._3).splitAt(i)
        val (a1, a2) = (a(l), a(rr))
        val cost = a1.toDouble / i + a2.toDouble / (series.length - i)
        (cost, series(i - 1)._2, i, a1, a2)
      }.minBy(t => (t._1, t._2.toEpochDay))
      assert(r.getAs[java.sql.Date]("split_day").toLocalDate === best._2,
        s"split mismatch for $et")
      assert(r.getAs[Long]("n_left") === best._3.toLong)
      assert(BigInt(r.getAs[Long]("sse_left_scaled")) === best._4)
      assert(BigInt(r.getAs[Long]("sse_right_scaled")) === best._5)
    }
  }

  test("q332: every (type, day) has n_segments = n_events - 1, twap sits " +
    "inside the day's cent range, and one group replays exactly") {
    val rows = SparkEntry.queries("q332_twap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_segments") === r.getAs[Long]("n_events") - 1) }
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("unix_micros(ts)").as("tsus"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // replay the group with the most events (the interesting one)
    val target = rows.maxBy(_.getAs[Long]("n_events"))
    val et = target.getString(0)
    val day = target.getAs[java.sql.Date]("day").toLocalDate
    val g = ev.filter(e => e._1 == et && e._2 == day)
      .sortBy(e => (e._3, e._4))
    val segs = g.zip(g.tail).map { case (a, b) => (a._5, b._3 - a._3) }
    val sumDur = segs.map(_._2).sum
    assert(target.getAs[Long]("sum_dur_us") === sumDur)
    if (sumDur > 0) {
      val wsum = segs.map { case (c, d) => BigInt(c) * d }.sum
      val expect = if (wsum >= 0) (wsum / sumDur).toLong
        else -((-wsum) / sumDur).toLong
      assert(target.getAs[Long]("twap_cents") === expect)
      val cs = segs.map(_._1)
      assert(expect >= cs.min && expect <= cs.max)
    }
  }

  test("q337: the lateness histogram conserves the event count and " +
    "replays driver-side from per-user arrival order") {
    val rows = SparkEntry.queries("q337_late_event_audit")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bucket(lateUs: Long): Long =
      if (lateUs == 0) 0L else if (lateUs <= 1000000L) 1L
      else if (lateUs <= 10000000L) 2L else if (lateUs <= 60000000L) 3L
      else if (lateUs <= 600000000L) 4L else 5L
    val expect = ev.groupBy(_._1).values.flatMap { g =>
      var runMax = Long.MinValue
      g.sortBy(_._2).map { e =>
        runMax = math.max(runMax, e._3)
        runMax - e._3
      }
    }.toSeq
    val hist = expect.groupBy(bucket).view
      .mapValues(ls => (ls.size.toLong, ls.max)).toMap
    assert(rows.map(_.getAs[Long]("n_events")).sum === ev.length.toLong)
    rows.foreach { r =>
      val (n, mx) = hist(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("max_late_us") === mx)
    }
    assert(rows.map(_.getAs[Long]("bucket")).toSet === hist.keySet)
  }

  test("q340: both lower medians replay driver-side per event_type") {
    val rows = SparkEntry.queries("q340_mad_scale")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    def lowerMed[A](xs: Seq[(Long, A)])(implicit o: Ordering[(Long, A)]): Long =
      xs.sorted(o).apply((xs.length + 1) / 2 - 1)._1
    rows.foreach { r =>
      val et = r.getString(0)
      val series = daily.filter(_._1 == et).map(e => (e._3, e._2.toEpochDay))
      assert(r.getAs[Long]("n_days") === series.length.toLong)
      val med = lowerMed(series)
      assert(r.getAs[Long]("median_daily") === med)
      val devs = daily.filter(_._1 == et)
        .map(e => (math.abs(e._3 - med), e._2.toEpochDay))
      assert(r.getAs[Long]("mad_daily") === lowerMed(devs), s"MAD for $et")
    }
  }

  test("q346: sampling is user-coherent (all-or-nothing per user) and " +
    "the per-type census replays") {
    val rows = SparkEntry.queries("q346_trace_sample")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def sampled(u: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 20 == 0
    }
    rows.foreach { r =>
      val t = r.getString(0)
      val mine = ev.filter(_._2 == t)
      assert(r.getAs[Long]("n_total") === mine.length.toLong)
      assert(r.getAs[Long]("n_sampled") ===
        mine.count(e => sampled(e._1)).toLong)
      assert(r.getAs[Long]("n_users_total") ===
        mine.map(_._1).distinct.length.toLong)
      assert(r.getAs[Long]("n_users_sampled") ===
        mine.map(_._1).distinct.count(sampled).toLong)
    }
    // coherence is definitional (membership depends only on user_id);
    // assert the realized sample is non-trivial both ways
    val users = ev.map(_._1).distinct
    val s = users.count(sampled)
    assert(s > 0 && s < users.length)
  }

  test("q348: activation counts replay per type and the __all baseline " +
    "covers every user") {
    val rows = SparkEntry.queries("q348_activation_report")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), to_date(col("ts")), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val perUser = ev.groupBy(_._1).map { case (u, g) =>
      val first = g.map(_._2.toEpochDay).min
      val returned = g.exists(_._2.toEpochDay > first)
      (u, first, returned, g.filter(_._2.toEpochDay == first)
        .map(_._3).toSet)
    }.toSeq
    val all = rows("__all")
    assert(all.getAs[Long]("n_users") === perUser.length.toLong)
    assert(all.getAs[Long]("n_returned") ===
      perUser.count(_._3).toLong)
    rows.filterKeys(_ != "__all").foreach { case (t, r) =>
      val acted = perUser.filter(_._4.contains(t))
      assert(r.getAs[Long]("n_users") === acted.length.toLong, s"users $t")
      assert(r.getAs[Long]("n_returned") === acted.count(_._3).toLong)
      assert(r.getAs[Long]("activation_ppm") ===
        BigInt(acted.count(_._3)) * 1000000 / acted.length)
      assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_users"))
    }
  }

  test("q372: the Haar transform replays driver-side on the 512-hour " +
    "spine and every level obeys the unnormalized Parseval invariant") {
    val hrs = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(expr("unix_micros(ts) div 3600000000")).as[Long].collect()
    val h0 = hrs.min
    val counts = hrs.groupBy(identity).view.mapValues(_.size.toLong)
    val x0 = (0L until 512L).map(i => counts.getOrElse(i + h0, 0L)).toArray
    def step(a: Array[Long]): (Array[Long], Array[Long]) = {
      val n = a.length / 2
      (Array.tabulate(n)(i => a(2 * i) + a(2 * i + 1)),
        Array.tabulate(n)(i => a(2 * i) - a(2 * i + 1)))
    }
    def e(a: Array[Long]): BigInt = a.map(v => BigInt(v) * v).sum
    val (a1, d1) = step(x0); val (a2, d2) = step(a1)
    val (a3, d3) = step(a2); val (a4, d4) = step(a3)
    val expect = Map("d1" -> (256L, e(d1)), "d2" -> (128L, e(d2)),
      "d3" -> (64L, e(d3)), "d4" -> (32L, e(d4)), "e_a4" -> (32L, e(a4)))
    val rows = SparkEntry.queries("q372_wavelet_energy")(spark, sfDir)
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, en) = expect(r.getString(0))
      assert(r.getAs[Long]("n_coeffs") === n, r.getString(0))
      assert(BigInt(r.getAs[Long]("energy")) === en, r.getString(0))
    }
    // unnormalized Parseval per level: E(a_l) + E(d_l) = 2 E(a_{l-1})
    assert(e(a1) + e(d1) === 2 * e(x0))
    assert(e(a2) + e(d2) === 2 * e(a1))
    assert(e(a3) + e(d3) === 2 * e(a2))
    assert(e(a4) + e(d4) === 2 * e(a3))
  }

  test("q373: per-user gap cv2, the flag law, and the top-20 order " +
    "replay driver-side") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val stats = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      if (gaps.length >= 19 && gaps.sum > 0) {
        val n = BigInt(gaps.length); val s = gaps.map(BigInt(_)).sum
        val s2 = gaps.map(g => BigInt(g) * g).sum
        Some((u, gaps.length.toLong, (s / n).toLong,
          ((n * s2 - s * s) * 1000000 / (s * s)).toLong))
      } else None
    }
    val expect = stats.sortBy { case (u, _, _, cv2) => (cv2, u) }.take(20)
    val rows = SparkEntry.queries("q373_bot_regularity")(spark, sfDir)
      .collect()
    assert(rows.length === math.min(20, stats.length))
    rows.zip(expect).foreach { case (r, (u, n, mg, cv2)) =>
      assert(r.getAs[Long]("user_id") === u)
      assert(r.getAs[Long]("n_gaps") === n)
      assert(r.getAs[Long]("mean_gap_us") === mg)
      assert(r.getAs[Long]("cv2_ppm") === cv2)
      assert(r.getAs[Boolean]("bot_flag") === (cv2 < 50000L))
    }
  }
}
