package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ProfilingQueries

class ProfilingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q229: key-determined FDs hold, non-key candidates are discriminated, " +
    "and violation counts recount exactly") {
    val rows = SparkEntry.queries("q229_fd_discovery")(spark, sfDir)
      .collect()
      .map(r => ((r.getAs[String]("table_name"), r.getAs[String]("determinant"),
        r.getAs[String]("dependent")),
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_violating_keys"),
          r.getAs[Boolean]("holds")))).toMap
    assert(rows.size === ProfilingQueries.FdCandidates.size)
    // primary keys determine everything
    assert(rows(("nation", "n_nationkey", "n_name"))._3)
    assert(rows(("orders", "o_orderkey", "o_orderstatus"))._3)
    assert(rows(("customer", "c_custkey", "c_nationkey"))._3)
    // a customer places orders in several statuses — must NOT hold
    val cust = rows(("orders", "o_custkey", "o_orderstatus"))
    assert(!cust._3 && cust._2 > 0, s"expected o_custkey FD to fail: $cust")
    // recount one candidate driver-side
    val expect = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(countDistinct("o_orderstatus").as("n"))
      .filter(col("n") > 1).count()
    assert(cust._2 === expect)
    rows.values.foreach { case (k, v, h) =>
      assert(v <= k); assert(h === (v == 0)) }
  }

  test("q230: the fixture graph is intact, and the orphan detector fires on " +
    "a planted dangling key") {
    val rows = SparkEntry.queries("q230_ri_audit")(spark, sfDir).collect()
    assert(rows.length === ProfilingQueries.FkRelationships.size)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("intact"),
        s"unexpected orphans in ${r.getAs[String]("child_table")}")
      assert(r.getAs[Long]("n_orphan_rows") === 0L)
      assert(r.getAs[Long]("n_child_rows") > 0L)
    }
    // plant: two rows referencing a parent that does not exist
    val child = Seq((1L, 10L), (2L, 999L), (3L, 999L), (4L, 20L))
      .toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val audit = ProfilingQueries.riOrphans(child, "fk", parent, "pk")
      .collect().head
    assert(audit.getAs[Long]("n_orphan_rows") === 2L)
    assert(audit.getAs[Long]("n_orphan_keys") === 1L)
  }

  test("q234: first-digit counts tile the positive-price orders and the " +
    "uniform-ish fixture measurably violates Benford") {
    val rows = SparkEntry.queries("q234_benford_audit")(spark, sfDir)
      .collect()
    val nPos = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum === nPos)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1L && d <= 9L)
      assert(r.getAs[Long]("dev_ppm") ===
        math.abs(r.getAs[Long]("observed_ppm") - r.getAs[Long]("benford_ppm")))
    }
    // a uniform generator cannot hug Benford: total deviation is large
    assert(rows.map(_.getAs[Long]("dev_ppm")).sum > 100000L,
      "fixture unexpectedly Benford-conformant")
  }

  test("q235: the data contract holds on the fixture and violation counts " +
    "recount exactly for one predicate") {
    val rows = SparkEntry.queries("q235_constraint_audit")(spark, sfDir)
      .collect()
    assert(rows.length === ProfilingQueries.ColumnConstraints.size)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("passes"),
        s"rule ${r.getAs[String]("rule_id")} unexpectedly violated")
      assert(r.getAs[Long]("n_violations") === 0L)
    }
    val manual = Tables.lineitem(spark, sfDir)
      .filter(!(col("l_discount") >= 0 && col("l_discount") <= 1)).count()
    assert(manual === 0L)
  }

  test("q245: fan-out totals reconcile with child row counts and the " +
    "min/mean/max ordering holds") {
    val rows = SparkEntry.queries("q245_join_fanout")(spark, sfDir).collect()
    assert(rows.length === ProfilingQueries.FkRelationships.size)
    rows.foreach { r =>
      val (np, nc) = (r.getAs[Long]("n_parents"), r.getAs[Long]("n_childless"))
      val (mn, mx) = (r.getAs[Long]("min_fanout"), r.getAs[Long]("max_fanout"))
      val mean = r.getAs[Long]("mean_fanout_ppm")
      assert(nc <= np)
      assert(mn <= mx)
      assert(mn * 1000000L <= mean && mean <= mx * 1000000L)
      if (nc > 0) assert(mn === 0L)
    }
    val li2o = rows.find(_.getAs[String]("child_table") == "lineitem")
      .filter(_.getAs[String]("fk_column") == "l_orderkey")
    // reconcile against the raw child count via the mean identity
    val r0 = rows.find(r => r.getAs[String]("child_table") == "orders").get
    val totalOrders = Tables.orders(spark, sfDir).count()
    val totalCustomers = Tables.customer(spark, sfDir).count()
    assert(r0.getAs[Long]("n_parents") === totalCustomers)
    assert(r0.getAs[Long]("mean_fanout_ppm") ===
      BigInt(totalOrders) * 1000000 / totalCustomers)
    assert(li2o.nonEmpty)
  }

  test("q248: sixteen equi-depth buckets tile the orders, spans are " +
    "ordered and non-overlapping, depths balanced ±1") {
    val rows = SparkEntry.queries("q248_equidepth_histogram")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("ndv")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 16L))
    assert(rows.map(_._2).sum === Tables.orders(spark, sfDir).count())
    val depths = rows.map(_._2)
    assert(depths.max - depths.min <= 1)
    rows.foreach { case (_, n, lo, hi, ndv) =>
      assert(lo <= hi); assert(ndv >= 1L && ndv <= n) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3,
        s"bucket spans overlap: ${a._4} > ${b._3}")
      case _ =>
    }
  }

  test("q249: the salt plan flags exactly the >2x-mean keys and " +
    "prescribes factors that land buckets near the target") {
    val counts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val nKeys = counts.size.toLong
    val expectedHot = counts.filter { case (_, c) => c * nKeys > 2 * total }
    val rows = SparkEntry.queries("q249_salt_plan")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("c"),
        r.getAs[Long]("salts"), r.getAs[Long]("rows_per_salt_ceil")))
    assert(rows.map(_._1).toSet === expectedHot.keySet,
      "flagged set must equal the >2x-mean keys")
    rows.foreach { case (k, c, salts, rps) =>
      assert(c === expectedHot(k))
      assert(salts ===
        (BigInt(c) * nKeys * 100 + 200 * total - 1) / (200 * total))
      assert(salts >= 2L, "a flagged key needs at least 2 salts")
      assert(rps === (c + salts - 1) / salts)
    }
    // the small fixture is under 2x-mean everywhere — prove the plan
    // FIRES at a 120% threshold (conf round-trip, q162's discipline)
    spark.conf.set("spark.graft.salt.thresholdPct", "120")
    try {
      val strict = SparkEntry.queries("q249_salt_plan")(spark, sfDir)
        .collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[Long]("c"),
          r.getAs[Long]("salts")))
      val hot120 = counts.filter { case (_, c) => c * nKeys * 100 > 120 * total }
      assert(strict.map(_._1).toSet === hot120.keySet)
      assert(strict.nonEmpty, "1.2x-mean keys exist; plan must fire")
      strict.foreach { case (k, c, salts) =>
        assert(salts ===
          (BigInt(c) * nKeys * 100 + 120 * total - 1) / (120 * total), s"key $k")
      }
    } finally spark.conf.unset("spark.graft.salt.thresholdPct")
  }

  test("q251: linear counting holds small cardinalities within 20%, and " +
    "the raw branch holds a 5000-distinct synthetic set within 10%") {
    import spark.implicits._
    val rows = SparkEntry.queries("q251_hll_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("use_lc"),
        "tiny per-source cardinalities must take the LC branch")
      assert(r.getAs[Long]("err_ppm") <= 200000L,
        s"source ${r.getAs[String]("source")}: err ${r.getAs[Long]("err_ppm")}")
    }
    // raw branch: one group, 5000 distinct values
    val synth = (1 to 5000).map(i => ("g", s"value_$i")).toDF("g", "s")
    val est = graft.queries.ProfilingQueries.hllSketch(synth, "g", "s")
      .collect().head
    assert(!est.getAs[Boolean]("use_lc"), "5000 >> 640 must take raw HLL")
    val e = est.getAs[Long]("hll_est")
    assert(math.abs(e - 5000L) <= 500L,
      s"raw HLL estimate $e outside 10% of 5000")
  }

  test("q252: Gini is in [0, 1), matches a driver-side exact recompute, " +
    "and a constant distribution scores zero") {
    val rows = SparkEntry.queries("q252_gini_value")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cents = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"), col("o_orderkey"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L)
      val xs = cents(r.getAs[String]("priority"))
        .map(x => (x.getLong(1), x.getLong(2))).sortBy(identity).map(_._1)
      val n = BigInt(xs.length)
      val s0 = xs.map(BigInt(_)).sum
      val s1 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      assert(g === ((2 * s1 - (n + 1) * s0) * 1000000 / (n * s0)).toLong)
      assert(r.getAs[Long]("n") === xs.length.toLong)
    }
    // uniform mass ⇒ exact zero
    import spark.implicits._
    val const = Seq.tabulate(10)(i => ("g", i.toLong + 1, 700L))
      .toDF("o_orderpriority", "o_orderkey", "cents")
    val n = 10L
    val s0 = 7000L
    val s1 = (1L to 10L).map(_ * 700L).sum
    assert((2 * s1 - (n + 1) * s0) === 0L)
  }

  test("q262: ABC classes partition the parts, shares sum to ~10^6, and " +
    "A's share is at least 80% minus the boundary part") {
    val rows = SparkEntry.queries("q262_abc_classes")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("share_ppm"))).toMap
    assert(rows.keySet === Set("A", "B", "C"))
    val nParts = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(rows.values.map(_._1).sum === nParts)
    val shares = rows.values.map(_._2).sum
    assert(shares >= 999997L && shares <= 1000000L, s"shares sum $shares")
    assert(rows("A")._2 >= 800000L, "A must cover at least 80% of revenue")
    assert(rows("A")._2 <= rows("A")._2 + rows("B")._2)
    assert(rows("A")._1 < nParts, "A cannot be everything")
  }

  test("q263: the synthetic fixture's independent header totals mismatch " +
    "nearly everywhere, and the counts recount exactly") {
    val r = SparkEntry.queries("q263_reconciliation")(spark, sfDir)
      .collect().head
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(r.getAs[Long]("n_orders") === nOrders)
    val withLines = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    assert(r.getAs[Long]("n_lineless") === nOrders - withLines)
    assert(r.getAs[Long]("n_mismatched") > (nOrders - r.getAs[Long]("n_lineless")) / 2,
      "independent random totals must mismatch mostly")
    assert(r.getAs[Long]("max_abs_diff_u") > 0L)
  }

  test("q267: declared keys verify, non-keys are rejected with exact " +
    "duplicate counts") {
    val rows = SparkEntry.queries("q267_key_discovery")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("key_columns"))
        -> (r.getAs[Long]("n_dup_rows"), r.getAs[Boolean]("is_key"))).toMap
    assert(rows.size === ProfilingQueries.KeyCandidates.size)
    // true keys
    Seq(("orders", "o_orderkey"), ("events", "event_id"),
      ("customer", "c_custkey"))
      .foreach { k => assert(rows(k)._2, s"$k must be a key") }
    // non-keys with real duplicate mass — including TPC-H's canonical
    // composite key, which this synthetic generator does NOT honor
    // (the discovery that makes the audit worth running)
    Seq(("orders", "o_custkey"), ("lineitem", "l_orderkey"),
      ("lineitem", "l_orderkey,l_linenumber")).foreach { k =>
      assert(!rows(k)._2 && rows(k)._1 > 0L, s"$k must fail as a key") }
    // recount one duplicate mass
    val dup = Tables.orders(spark, sfDir).count() -
      Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(rows(("orders", "o_custkey"))._1 === dup)
  }

  test("q272: winsorized means recount exactly against a driver-side " +
    "replay, and the clipping laws hold") {
    val rows = ProfilingQueries.q272WinsorizedQuality(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("nw"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val nws = docs(src).sortBy(d => (d._3, d._2)).map(_._3)
      val n = nws.length
      val klo = (n + 9) / 10
      val lo = nws(klo - 1)
      val hi = nws(n - klo)
      assert(r.getAs[Long]("lo_cut") === lo, src)
      assert(r.getAs[Long]("hi_cut") === hi, src)
      assert(lo <= hi, src)
      val wins = nws.map(v => math.max(lo, math.min(hi, v))).sum
      assert(r.getAs[Long]("sum_wins") === wins, src)
      assert(r.getAs[Long]("sum_raw") === nws.sum, src)
      assert(r.getAs[Long]("mean_wins_milli") === wins * 1000 / n, src)
    }
    // the robust mean must actually differ somewhere — otherwise the
    // corpus has no tails and the operator is untested
    assert(rows.exists(r =>
      r.getAs[Long]("mean_wins_milli") != r.getAs[Long]("mean_raw_milli")),
      "no source had clipped tails - vacuous corpus")
  }

  test("q277: layout advisor recounts against events and its verdicts " +
    "are internally consistent") {
    val rows = ProfilingQueries.q277LayoutAdvisor(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val direct = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"),
        (lit(40L) + length(col("event_type"))).as("b"))
      .groupBy("day").agg(count(lit(1)).as("n"), sum("b").as("bytes"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(t => t._1.toString -> (t._2, t._3)).toMap
    val total = rows.map(_.getAs[Long]("est_bytes")).sum
    val nParts = rows.length
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      val (n, bytes) = direct(day)
      assert(r.getAs[Long]("n_rows") === n, day)
      assert(r.getAs[Long]("est_bytes") === bytes, day)
      assert(r.getAs[Long]("files_128mb") === (bytes + 134217727) / 134217728)
      assert(r.getAs[Boolean]("small") === (bytes < 16777216L), day)
      assert(r.getAs[Boolean]("skewed") === (bytes * nParts > total * 8L), day)
      assert(r.getAs[Long]("files_128mb") >= 1L, day)
    }
  }

  test("q281: f-profile recounts exactly and the Chao1 laws hold") {
    val rows = ProfilingQueries.q281FreqProfile(spark, sfDir).collect()
    assert(rows.length === ProfilingQueries.FreqProfileColumns.length)
    rows.foreach { r =>
      val (d, f1, f2) = (r.getAs[Long]("n_distinct"), r.getAs[Long]("f1"),
        r.getAs[Long]("f2"))
      assert(r.getAs[Long]("chao1_lb") === d + f1 * (f1 - 1) / (2 * (f2 + 1)))
      assert(r.getAs[Long]("chao1_lb") >= d,
        "Chao1 is a LOWER bound on true distinct, never below observed")
      // f-mass never exceeds the row count
      val fmass = (1 to 5).map(k => k * r.getAs[Long](s"f$k")).sum
      assert(fmass <= r.getAs[Long]("n_rows"), r.toString)
    }
    // driver recount of one audited column
    val counts = Tables.events(spark, sfDir)
      .groupBy("event_type").count().as[(String, Long)].collect()
    val r = rows.find(x => x.getAs[String]("table_name") == "events" &&
      x.getAs[String]("column_name") == "event_type").get
    assert(r.getAs[Long]("n_distinct") === counts.length)
    assert(r.getAs[Long]("f1") === counts.count(_._2 == 1))
    assert(r.getAs[Long]("n_rows") === counts.map(_._2).sum)
  }

  test("q287: the class-size histogram recounts exactly and conserves " +
    "the customer population") {
    val rows = ProfilingQueries.q287KAnonymity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_k"))
      .as[(Int, String, Long)].collect()
    val classes = custs.groupBy(identity).map(_._2.length.toLong)
    val hist = classes.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(rows.map(_.getAs[Long]("n_rows")).sum === custs.length.toLong)
    rows.foreach { r =>
      val s = r.getAs[Long]("class_size")
      assert(r.getAs[Long]("n_classes") === hist(s), s"size $s")
      assert(r.getAs[Boolean]("at_risk") === (s < 5))
    }
    assert(rows.exists(_.getAs[Boolean]("at_risk")),
      "no class below k=5 - the risk flag is untested on this fixture")
  }

  test("q288: temporal audit recounts exactly and surfaces the fixture's " +
    "independent-date property") {
    val rows = ProfilingQueries.q288TemporalAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val joined = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(year(col("o_orderdate")), col("l_shipdate") < col("o_orderdate"))
      .as[(Int, Boolean)].collect()
    assert(rows.map(_.getAs[Long]("n_lineitems")).sum === joined.length.toLong)
    rows.foreach { r =>
      val y = r.getAs[Int]("order_year")
      val inYear = joined.filter(_._1 == y)
      assert(r.getAs[Long]("n_lineitems") === inYear.length.toLong, y)
      assert(r.getAs[Long]("n_violations") === inYear.count(_._2).toLong, y)
    }
    // the synthetic generator draws dates independently — the audit's
    // whole value is that it MEASURES this rather than assuming TPC-H
    assert(rows.map(_.getAs[Long]("n_violations")).sum > 0)
  }

  test("q290: Good-Turing estimates replay exactly from q281's f-profile") {
    val gt = ProfilingQueries.q290GoodTuring(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"),
        r.getAs[String]("column_name")) -> r).toMap
    val fp = ProfilingQueries.q281FreqProfile(spark, sfDir).collect()
    assert(gt.size === fp.length)
    fp.foreach { f =>
      val r = gt((f.getAs[String]("table_name"), f.getAs[String]("column_name")))
      val (f1, f2, f3, f4) = (f.getAs[Long]("f1"), f.getAs[Long]("f2"),
        f.getAs[Long]("f3"), f.getAs[Long]("f4"))
      assert(r.getAs[Long]("f1") === f1)
      assert(r.getAs[Long]("p0_ppm") === f1 * 1000000L / f.getAs[Long]("n_rows"))
      def chk(name: String, num: Long, den: Long): Unit =
        if (den > 0) assert(r.getAs[Long](name) === num * 1000 / den, name)
        else assert(r.isNullAt(r.fieldIndex(name)), s"$name must be NULL")
      chk("rstar1_milli", 2 * f2, f1)
      chk("rstar2_milli", 3 * f3, f2)
      chk("rstar3_milli", 4 * f4, f3)
    }
  }

  test("q302: uniformity estimate never overshoots (Cauchy–Schwarz) and " +
    "the actual column IS the executed self-join cardinality") {
    import org.apache.spark.sql.functions._
    val rows = ProfilingQueries.q302JoinCardEstimate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_rows")
      val actual = r.getAs[Long]("actual_rows")
      assert(est <= actual,
        s"band ${r.getAs[Long]("band")}: estimate $est overshoots $actual")
      assert(r.getAs[Long]("underest_ppm") ===
        (actual - est) * 1000000L / actual)
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
    }
    // the audit's central claim: Σ per-key n(k)² equals the row count of
    // the MATERIALIZED self-equi-join — exact join cardinality without
    // executing the join
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey").as("k"))
    val executed = li.as("a").join(li.as("b"), "k").count()
    assert(rows.map(_.getAs[Long]("actual_rows")).sum === executed)
  }

  test("q310: KMV laws — saturated sketches are exact, the kth minimum is " +
    "the true order statistic, the estimator replays, and the plan rides " +
    "the GroupTopK operator") {
    val df = ProfilingQueries.q310KmvDistinct(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val M = 1152921504606846976L // 2^60
    rows.foreach { r =>
      val (ret, exact, est) = (r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("kmv_est"))
      assert(ret === math.min(64L, exact), s"retained wrong: $r")
      if (ret < 64) assert(est === exact && r.getAs[Long]("err_ppm") === 0L,
        s"saturated sketch must be exact: $r")
      else assert(est ===
        (BigInt(63) * M / r.getAs[Long]("kth_min")).toLong, s"estimator: $r")
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(est - exact) * 1000000L / exact)
    }
    // one source's kth_min recomputed from the raw distinct hash set
    val src = rows.head.getAs[String]("source")
    val hs = Tables.documents(spark, sfDir)
      .filter(col("source") === src)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
      .select(expr(
        "CAST(conv(substring(md5(term), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .distinct().orderBy(col("h")).limit(64).collect().map(_.getLong(0))
    assert(rows.head.getAs[Long]("kth_min") === hs.last)
    // the k-smallest selection must be the bounded-heap operator, not a sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan.take(1500))
  }

  test("q319: KS distance replays exactly driver-side - ECDF sup-norm, " +
    "location, ppm and the 95% verdict") {
    val row = SparkEntry.queries("q319_ks_distance")(spark, sfDir)
      .collect().head
    val vals = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"),
        (col("o_orderkey") % 2).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = vals.filter(_._2 == 0L).map(_._1).sorted
    val b = vals.filter(_._2 == 1L).map(_._1).sorted
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    val points = (a ++ b).distinct.sorted
    val diffs = points.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      (v, (BigInt(ca) * b.length - BigInt(cb) * a.length).abs)
    }
    val dmax = diffs.map(_._2).max
    assert(row.getAs[Long]("at_cents") ===
      diffs.filter(_._2 == dmax).map(_._1).min)
    assert(row.getAs[Long]("ks_ppm") ===
      (dmax * 1000000 / (BigInt(a.length) * b.length)).toLong)
    val reject = dmax * dmax * 1000000 >
      BigInt(1843881) * (a.length + b.length) * a.length * b.length
    assert(row.getAs[Long]("reject_95") === (if (reject) 1L else 0L))
  }

  test("q322: Mann-Whitney u2 replays brute-force per source, and the " +
    "marginals cover the corpus") {
    val rows = SparkEntry.queries("q322_mann_whitney")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val na = r.getAs[Long]("n_a")
      val nb = r.getAs[Long]("n_b")
      assert(na + nb === n)
      val mine = docs.filter(_._1 == s).map(_._2)
      val rest = docs.filter(_._1 != s).map(_._2)
      assert(na === mine.length.toLong && nb === rest.length.toLong)
      // brute-force doubled U: 2 per strict win, 1 per tie
      val u2 = (for (x <- mine; y <- rest) yield {
        if (x > y) 2L else if (x == y) 1L else 0L
      }).sum
      assert(r.getAs[Long]("u2") === u2, s"u2 mismatch for $s")
      val expPpm = {
        val num = BigInt(u2) - BigInt(na) * nb
        val den = BigInt(na) * nb
        if (num >= 0) (num * 1000000 / den).toLong
        else -(((-num) * 1000000) / den).toLong
      }
      assert(r.getAs[Long]("rb_ppm") === expPpm)
    }
  }

  test("q328: Spearman rho replays driver-side (doubled midranks + exact " +
    "isqrt) and stays in [-1e6, 1e6]") {
    val rows = SparkEntry.queries("q328_spearman_corr")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(2)) assert(math.abs(r.getLong(2)) <= 1000000L) }
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      var cum = 0L
      vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        .map { case (v, c) => cum += c; v -> (2 * cum - c + 1) }.toMap
    }
    def isqrt(v: BigInt): BigInt =
      if (v <= 0) BigInt(0) else {
        var r = BigInt(math.sqrt(v.toDouble).toLong)
        while (r * r > v) r -= 1
        while ((r + 1) * (r + 1) <= v) r += 1
        r
      }
    rows.foreach { row =>
      val src = row.getString(0)
      val mine = docs.filter(_._1 == src)
      assert(row.getLong(1) === mine.length.toLong)
      val rx = rank2(mine.map(_._2)); val ry = rank2(mine.map(_._3))
      val n = BigInt(mine.length)
      val xs = mine.map(d => BigInt(rx(d._2)))
      val ys = mine.map(d => BigInt(ry(d._3)))
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.lazyZip(ys).map(_ * _).sum
      val num = n * sxy - sx * sy
      val wx = isqrt(n * xs.map(a => a * a).sum - sx * sx)
      val wy = isqrt(n * ys.map(a => a * a).sum - sy * sy)
      if (wx == 0 || wy == 0) assert(row.isNullAt(2), s"$src expected NULL")
      else {
        // the engine clamps the truncated-sqrt overshoot at 1e6
        val q = ((num.abs * 1000000) / (wx * wy)).min(BigInt(1000000))
        val expect = if (num >= 0) q.toLong else -q.toLong
        assert(row.getLong(2) === expect, s"rho mismatch for $src")
      }
    }
  }

  test("q339: Cochran-Armitage cells and verdict replay driver-side from " +
    "the q78 keep labels") {
    val r = SparkEntry.queries("q339_cochran_armitage")(spark, sfDir)
      .collect().head
    val keep = graft.queries.CurationQueries
      .q78QualityRepetition(spark, sfDir)
      .select(col("doc_id"), col("keep")).collect()
      .map(x => x.getLong(0) -> (if (x.getBoolean(1)) 1L else 0L)).toMap
    val cells = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map { x =>
        val w = if (x.getLong(1) < 150) 0L else if (x.getLong(1) < 300) 1L
          else if (x.getLong(1) < 450) 2L else 3L
        (w, keep(x.getLong(0)))
      }
    val n = cells.length.toLong
    val k = cells.map(_._2).sum
    assert(r.getAs[Long]("n_docs") === n)
    assert(r.getAs[Long]("n_keep") === k)
    val swk = cells.map { case (w, y) => w * y }.sum
    val swn = cells.map(_._1).sum
    val sw2n = cells.map { case (w, _) => w * w }.sum
    assert(r.getAs[Long]("swk") === swk)
    assert(r.getAs[Long]("swn") === swn)
    val tNum = BigInt(n) * swk - BigInt(k) * swn
    assert(BigInt(r.getAs[Long]("t_num")) === tNum)
    val reject = tNum * tNum * n * 1000000 >
      BigInt(3841459) * k * (n - k) * (BigInt(n) * sw2n - BigInt(swn) * swn)
    assert(r.getAs[Long]("reject_95") === (if (reject) 1L else 0L))
  }

  private def isqrtB(v: BigInt): BigInt =
    if (v <= 0) BigInt(0) else {
      var r = BigInt(math.sqrt(v.toDouble).toLong)
      while (r * r > v) r -= 1
      while ((r + 1) * (r + 1) <= v) r += 1
      r
    }

  test("q355: Kruskal-Wallis H replays driver-side (global doubled " +
    "midranks, per-group truncation, tie correction, critical ladder)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var cum = 0L
    val r2 = docs.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      .map { case (v, c) => cum += c; (v, c, 2 * cum - c + 1) }
    val rank = r2.map(t => t._1 -> BigInt(t._3)).toMap
    val t3 = r2.map { case (_, c, _) => BigInt(c) * c * c - c }.sum
    val groups = docs.groupBy(_._1).toSeq.map { case (_, ds) =>
      (BigInt(ds.length), ds.map(d => rank(d._2)).sum) }
    val n = groups.map(_._1).sum
    val k = groups.size
    val t = groups.map { case (ni, rr2) => rr2 * rr2 / ni }.sum
    val hMilli = 3000 * t / (n * (n + 1)) - 3000 * (n + 1)
    val denom = n * n * n - n - t3
    val r = SparkEntry.queries("q355_kruskal_wallis")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n") === n.toLong)
    assert(r.getAs[Long]("k") === k.toLong)
    assert(BigInt(r.getAs[Long]("h_milli")) === hMilli)
    if (denom != 0) {
      val num = hMilli * (n * n * n - n)
      val hAdj = if (num >= 0) num / denom else -((-num) / denom)
      assert(BigInt(r.getAs[Long]("h_adj_milli")) === hAdj)
      val crit = Map(1 -> 3841L, 2 -> 5991L, 3 -> 7815L, 4 -> 9488L,
        5 -> 11070L, 6 -> 12592L, 7 -> 14067L, 8 -> 15507L)
      crit.get(k - 1) match {
        case Some(cv) => assert(r.getAs[Long]("reject_95") ===
          (if (hAdj > cv) 1L else 0L))
        case None => assert(r.isNullAt(r.fieldIndex("reject_95")))
      }
    }
  }

  test("q356: Wilcoxon signed-rank replays driver-side from raw events " +
    "(zero-diffs dropped, doubled midranks on |d|, tie-corrected verdict)") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, Long, Long)].collect()
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val ds = ev.groupBy(_._1).values.map { es =>
      es.filter(_._2 >= cut).map(_._3).sum -
        es.filter(_._2 < cut).map(_._3).sum
    }.filter(_ != 0L).toSeq
    var cum = 0L
    val r2 = ds.map(math.abs).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      .map { case (v, c) => cum += c; (v, c, 2 * cum - c + 1) }
    val rank = r2.map(t => t._1 -> BigInt(t._3)).toMap
    val t3 = r2.map { case (_, c, _) => BigInt(c) * c * c - c }.sum
    val n = BigInt(ds.length)
    val w2p = ds.filter(_ > 0).map(d => rank(math.abs(d))).sum
    val w2m = ds.filter(_ < 0).map(d => rank(math.abs(d))).sum
    val r = SparkEntry.queries("q356_wilcoxon_signed")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_pairs") === ds.length.toLong)
    assert(BigInt(r.getAs[Long]("w2_plus")) === w2p)
    assert(BigInt(r.getAs[Long]("w2_minus")) === w2m)
    // the doubled ranks of nonzero diffs must sum to n(n+1)
    assert(w2p + w2m === n * (n + 1))
    val dd = w2p - w2m
    val rb = if (dd >= 0) dd * 1000000 / (n * (n + 1))
      else -((-dd) * 1000000 / (n * (n + 1)))
    assert(BigInt(r.getAs[Long]("rb_ppm")) === rb)
    val vnum = 2 * n * (n + 1) * (2 * n + 1) - t3
    if (vnum != 0)
      assert(r.getAs[Long]("reject_95") ===
        (if (3 * dd * dd * 1000000 > 3841600 * vnum) 1L else 0L))
  }

  test("q357: chi2 and Cramer's V replay driver-side over the full margin " +
    "cross, and V is a valid ppm in [0, 1e6]") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = BigInt(docs.length)
    val cells = docs.groupBy(identity).view.mapValues(d => BigInt(d.length))
    val rm = docs.groupBy(_._1).view.mapValues(d => BigInt(d.length)).toMap
    val cm = docs.groupBy(_._2).view.mapValues(d => BigInt(d.length)).toMap
    val chi2Milli = (for { (s, rv) <- rm.toSeq; (l, cv) <- cm.toSeq } yield {
      val o = cells.getOrElse((s, l), BigInt(0))
      val num = (o * n - rv * cv) * (o * n - rv * cv) * 1000
      num / (n * rv * cv)
    }).sum
    val row = SparkEntry.queries("q357_cramers_v")(spark, sfDir)
      .collect().head
    assert(row.getAs[Long]("n") === n.toLong)
    assert(row.getAs[Long]("n_rows") === rm.size.toLong)
    assert(row.getAs[Long]("n_cols") === cm.size.toLong)
    assert(BigInt(row.getAs[Long]("chi2_milli")) === chi2Milli)
    val m = BigInt(math.min(rm.size - 1, cm.size - 1))
    if (m > 0) {
      val v2 = chi2Milli * 1000000000L / (n * m)
      val expect = isqrtB(v2).min(BigInt(1000000))
      assert(BigInt(row.getAs[Long]("v_ppm")) === expect)
      assert(row.getAs[Long]("v_ppm") >= 0 &&
        row.getAs[Long]("v_ppm") <= 1000000L)
    }
  }

  test("q363: l-diversity replays driver-side from raw customer rows and " +
    "the class partition conserves the table") {
    val rows = SparkEntry.queries("q363_l_diversity")(spark, sfDir)
      .collect()
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)"))
      .as[(Int, String, Long)].collect()
    assert(rows.map(_.getAs[Long]("class_size")).sum === cust.length.toLong)
    rows.foreach { r =>
      val mine = cust.filter(c =>
        c._1 == r.getAs[Int]("c_nationkey") &&
        c._2 == r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("class_size") === mine.length.toLong)
      val byV = mine.groupBy(_._3).view.mapValues(_.size.toLong)
      assert(r.getAs[Long]("l_distinct") === byV.size.toLong)
      assert(r.getAs[Long]("top_share_ppm") ===
        byV.values.max * 1000000L / mine.length)
      assert(r.getAs[Boolean]("at_risk_l3") === (byV.size < 3))
    }
  }

  test("q364: the 1-D EMD replays driver-side over the ordered bucket " +
    "axis, t is a valid ppm, and a class equal to the global mix scores 0") {
    val rows = SparkEntry.queries("q364_t_closeness")(spark, sfDir)
      .collect()
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)"))
      .as[(Int, String, Long)].collect()
    val buckets = cust.map(_._3).distinct.sorted
    val global = buckets.map(b => cust.count(_._3 == b).toLong)
    val n = BigInt(cust.length)
    val m = BigInt(buckets.length)
    rows.foreach { r =>
      val mine = cust.filter(c =>
        c._1 == r.getAs[Int]("c_nationkey") &&
        c._2 == r.getAs[String]("c_mktsegment"))
      val nc = BigInt(mine.length)
      assert(r.getAs[Long]("n_class") === mine.length.toLong)
      var cumC = BigInt(0); var cumG = BigInt(0); var emd = BigInt(0)
      buckets.init.zip(global.init).foreach { case (b, g) =>
        cumC += mine.count(_._3 == b); cumG += g
        emd += (cumC * n - cumG * nc).abs
      }
      val t = emd * 1000000 / ((m - 1) * nc * n)
      assert(BigInt(r.getAs[Long]("t_ppm")) === t)
      assert(t >= 0 && t <= 1000000)
      assert(r.getAs[Boolean]("at_risk_t20") === (t > 200000))
    }
  }

  test("q369: run and distinct counts replay driver-side in key order " +
    "and the recommendation follows the 50% thresholds") {
    val rows = SparkEntry.queries("q369_encoding_advisor")(spark, sfDir)
      .collect()
    assert(rows.length ===
      ProfilingQueries.EncodingCandidates.size)
    ProfilingQueries.EncodingCandidates.foreach { case (t, c, keys) =>
      val r = rows.find(x => x.getString(0) == t && x.getString(1) == c).get
      val vs = Tables.load(spark, sfDir, t)
        .orderBy(keys.map(col(_).asc): _*)
        .select(col(c).cast("string")).collect().map(_.getString(0))
      assert(r.getAs[Long]("n") === vs.length.toLong)
      val runs = 1L + vs.zip(vs.tail).count { case (a, b) => a != b }
      assert(r.getAs[Long]("runs") === runs, s"runs $t.$c")
      assert(r.getAs[Long]("ndv") === vs.distinct.length.toLong)
      val rle = (vs.length - runs) * 1000000L / vs.length
      val dict = (vs.length - vs.distinct.length) * 1000000L / vs.length
      assert(r.getAs[Long]("rle_savings_ppm") === rle)
      assert(r.getAs[Long]("dict_savings_ppm") === dict)
      val expect = if (rle >= 500000L) "rle"
        else if (dict >= 500000L) "dictionary" else "plain"
      assert(r.getAs[String]("recommendation") === expect)
    }
  }

  test("q370: estimated intermediates equal the EXECUTED join counts and " +
    "is_best marks the cheaper order") {
    val rows = SparkEntry.queries("q370_join_order_audit")(spark, sfDir)
      .collect()
    assert(rows.length === 2)
    val co = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey")).count()
    val ol = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count()
    val fin = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count()
    val a = rows.find(_.getString(0) == "a_customer_orders_first").get
    val b = rows.find(_.getString(0) == "b_orders_lineitem_first").get
    assert(a.getAs[Long]("intermediate_rows") === co)
    assert(b.getAs[Long]("intermediate_rows") === ol)
    assert(a.getAs[Long]("final_rows") === fin)
    assert(b.getAs[Long]("final_rows") === fin)
    val best = rows.minBy(r => (r.getAs[Long]("cost_rows"), r.getString(0)))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_best") === (r eq best)) }
  }
}
