package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MiningQueries

/** Invariant + plan-shape tests for the mining/integration operators
  * (q169–q176). The DuckDB oracle gates exactness; these pin the
  * semantic laws and the scale-relevant plan choices.
  */
class MiningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q169: every mention resolves once, never worse than its source name") {
    val out = MiningQueries.q169EntityResolution(spark, sfDir)
    val rows = out.collect()
    val parts = Tables.part(spark, sfDir)
      .select("p_partkey", "p_name").as[(Long, String)].collect().toMap
    val nMentions = parts.keys.count(_ % 10 == 0)
    assert(rows.length === nMentions)
    assert(rows.map(_.getAs[Long]("mention_id")).distinct.length === nMentions)
    // the resolved distance can never exceed the distance to the mention's
    // own source name (the source is always inside the skeleton block)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      val src = parts(r.getAs[Long]("mention_id"))
      assert(r.getAs[Long]("distance") <= lev(r.getAs[String]("mention"), src))
    }
    // scale shape: the catalog rides a broadcast join
    out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("q170: pair supports match a brute-force basket recount; lift is exact") {
    val out = MiningQueries.q170BasketPairs(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairCounts = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    val itemCounts = li.groupBy(_._2).view.mapValues(_.size).toMap
    val n = baskets.size.toLong
    assert(out.length === pairCounts.count(_._2 >= 2))
    out.foreach { r =>
      val key = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("pair_baskets") === pairCounts(key).toLong)
      val expectLift = n * pairCounts(key) >
        itemCounts(key._1).toLong * itemCounts(key._2)
      assert(r.getAs[Boolean]("lift_up") === expectLift)
    }
  }

  test("q171: merged base+delta state equals a direct one-pass aggregate") {
    val merged = MiningQueries.q171IncrementalAggMaintenance(spark, sfDir)
      .collect().map(r => r.getAs[Long]("ym") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("sum_cents"),
          r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))).toMap
    val direct = Tables.orders(spark, sfDir)
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy("ym")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        min("cents").as("mn"), max("cents").as("mx"))
      .collect().map(r => r.getAs[Long]("ym") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"),
          r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toMap
    assert(merged === direct)
  }

  test("q172: normalized values come from the pooled distribution; " +
    "each source's top doc maps to the pooled max") {
    val rows = MiningQueries.q172QuantileNormalize(spark, sfDir).collect()
    val pooled = rows.map(_.getAs[Long]("n_chars")).toSet
    assert(rows.forall(r => pooled.contains(r.getAs[Long]("norm_chars"))))
    val globalMax = rows.map(_.getAs[Long]("n_chars")).max
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val top = rs.maxBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      assert(top.getAs[Long]("norm_chars") === globalMax)
    }
  }

  test("q174: projection matches an independent driver-side recompute; " +
    "the operator itself is shuffle-free") {
    val out = MiningQueries.q174RandomProjection(spark, sfDir)
    val rows = out.collect()
    assert(rows.length === 500 * 16)
    // independent recompute for one vector
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, k: Int): Int = {
      val h = md.digest(s"jl_${j}_$k".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1 else -1
    }
    val vec = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val g = vec.map(x => math.floor(x * 16 + 0.5).toLong)
    val expected = (0 until 16).map(k =>
      (0 until 64).map(j => sign(j, k) * g(j)).sum)
    val got = rows.filter(_.getAs[Long]("vec_id") == 0L)
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("proj")).toSeq
    assert(got === expected)
    // scale shape: the only exchange is the presentation sort's range
    // partitioning — the projection itself never shuffles
    val plan = out.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(finalPlan).toList
    assert(exchanges.forall(_.contains("rangepartitioning")), finalPlan.take(3000))
  }

  test("q175: kept spans are corpus-unique; removed+kept counts reconcile") {
    val rows = MiningQueries.q175BoilerplateRemoval(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chunks") ===
        r.getAs[Long]("kept_chunks") + r.getAs[Long]("removed_chunks"))
    }
    // re-chunk every cleaned text (all spans are exactly 8 tokens) and
    // assert no surviving span appears in two documents
    val keptChunks = rows.flatMap { r =>
      val txt = r.getAs[String]("cleaned_text")
      if (txt.isEmpty) Seq.empty
      else txt.split(" ").grouped(8).map(c =>
        (r.getAs[Long]("doc_id"), c.mkString(" "))).toSeq
    }
    keptChunks.groupBy(_._2).foreach { case (chunk, occ) =>
      assert(occ.map(_._1).distinct.length === 1,
        s"boilerplate span survived in ${occ.length} docs: $chunk")
    }
  }

  test("q177: shares reconcile and the report is the true global top-20") {
    val rows = MiningQueries.q177SkewDiagnosis(spark, sfDir).collect()
    assert(rows.length === 20)
    val counts = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey").isNotNull)
      .groupBy("l_partkey").count()
      .as[(Long, Long)].collect()
    val top = counts.sortBy { case (k, c) => (-c, k) }.take(20)
    assert(rows.map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("cnt")))
      .toSeq === top.toSeq)
    val n = counts.map(_._2).sum
    rows.foreach(r =>
      assert(r.getAs[Long]("share_ppm") === r.getAs[Long]("cnt") * 1000000L / n))
  }

  test("q178: recall is the true ground-truth overlap and never exceeds 100") {
    val rows = MiningQueries.q178AnnRecallEval(spark, sfDir).collect()
    assert(rows.length === 8)
    val gt = queries.SimilarityQueries.q40CosineTopK(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val cand = queries.SimilarityQueries.q41AnnLsh(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val expect = gt.count(p => p._1 == qid && cand.contains(p))
      assert(r.getAs[Long]("hits") === expect.toLong)
      assert(r.getAs[Long]("recall_pct") <= 100L)
    }
  }

  test("q179: diff statuses reconstruct the two snapshots exactly") {
    val rows = MiningQueries.q179SnapshotDiff(spark, sfDir).collect()
    val keys = Tables.customer(spark, sfDir)
      .filter(col("c_custkey").isNotNull)
      .select("c_custkey").as[Long].collect()
    val added = keys.filter(k => k % 13 == 0 && k % 11 != 0).toSet
    val removed = keys.filter(k => k % 13 != 0 && k % 11 == 0).toSet
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("c_custkey")).toSet).toMap
    assert(byStatus.getOrElse("added", Set.empty) === added)
    assert(byStatus.getOrElse("removed", Set.empty) === removed)
    // changed rows: exactly the surviving keys hit by a mutation rule,
    // and the changed-column list matches the rule that fired
    byStatus.getOrElse("changed", Set.empty).foreach { k =>
      assert(k % 13 != 0 && k % 11 != 0 && (k % 5 == 0 || k % 7 == 0))
    }
    rows.filter(_.getAs[String]("status") == "changed").foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      val expect = Seq(
        if (k % 5 == 0) Some("c_name") else None,
        if (k % 7 == 0) Some("c_nationkey") else None).flatten.mkString(",")
      assert(r.getAs[String]("changed_cols") === expect)
    }
  }

  test("q180: winsorized sum equals a brute-force clamp at the same bounds") {
    val rows = MiningQueries.q180Winsorize(spark, sfDir).collect()
    val cents = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val vs = cents(r.getAs[String]("l_returnflag")).map(_._2)
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(lo <= hi)
      assert(r.getAs[Long]("n") === vs.length.toLong)
      assert(r.getAs[Long]("n_clip_lo") === vs.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_clip_hi") === vs.count(_ > hi).toLong)
      assert(r.getAs[Long]("winsorized_sum_cents") ===
        vs.map(v => math.min(math.max(v, lo), hi)).sum)
    }
  }

  test("q181: slope sign and value match a driver-side least-squares fit") {
    val rows = MiningQueries.q181TrendPerSegment(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, sx, sy, sxy, sxx) = (r.getAs[Long]("n_days"), r.getAs[Long]("sx"),
        r.getAs[Long]("sy"), r.getAs[Long]("sxy"), r.getAs[Long]("sxx"))
      val num = 1000000L * (n * sxy - sx * sy)
      val den = n * sxx - sx * sx
      assert(den > 0)
      assert(r.getAs[Long]("slope_ppm") === num / den)
    }
  }

  test("q182: labels are trustworthy - no negative is a confirmed positive, " +
    "every anchor gets negatives") {
    val rows = MiningQueries.q182ContrastivePairs(spark, sfDir).collect()
    val pos = rows.filter(_.getAs[Long]("label") == 1L)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val neg = rows.filter(_.getAs[Long]("label") == 0L)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pos.nonEmpty && neg.nonEmpty)
    val posNorm = pos.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    neg.foreach { case (a, b) =>
      assert(a != b)
      assert(!posNorm.contains((math.min(a, b), math.max(a, b))),
        s"negative ($a, $b) is a confirmed positive")
    }
    // every positive anchor has at least one surviving negative (k=3
    // samples; all three colliding is possible in principle but not on
    // this corpus)
    val anchors = pos.map(_._1)
    val negAnchors = neg.map(_._1).toSet
    assert(anchors.subsetOf(negAnchors))
  }

  test("q183: encoding is lossless everywhere and never above raw cost") {
    val rows = MiningQueries.q183DeltaGapEncoding(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"lossy encoding for term ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("gap_bytes") <= r.getAs[Long]("raw_bytes"))
      assert(r.getAs[Long]("min_id") <= r.getAs[Long]("max_id"))
      // segment discipline: ids stay inside the segment's id range
      val seg = r.getAs[Long]("segment")
      assert(r.getAs[Long]("min_id") / 256 === seg)
      assert(r.getAs[Long]("max_id") / 256 === seg)
    }
  }

  test("q184: zero leakage by construction, folds partition the corpus, " +
    "clusters never straddle folds") {
    val rows = MiningQueries.q184DedupAwareFolds(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("leakage_pairs")).sum === 0L)
    val nDocs = Tables.documents(spark, sfDir).count()
    val nPlants = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs + nPlants)
    // a doc-level hash split (q63 style) WOULD leak on this corpus —
    // the operator's reason to exist
    val pairs = queries.SimilarityQueries
      .q36DedupMinhash(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    def docFold(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(id.toString.getBytes("UTF-8"))
      (((h(0) & 0xff).toLong << 0) % 5 + 5) % 5
    }
    assert(pairs.exists { case (a, b) => docFold(a) != docFold(b) },
      "corpus has no straddling pairs under doc-level hashing — test is vacuous")
  }

  test("q184: persisted-component-table reuse is result-identical to re-contracting") {
    val tmp = java.nio.file.Files.createTempDirectory("q184idx").toString
    queries.GraphQueries.q141NearDupComponents(spark, sfDir)
      .select("doc_id", "component")
      .write.mode("overwrite").parquet(tmp)
    val direct = MiningQueries.q184DedupAwareFolds(spark, sfDir).collect().toSeq
    spark.conf.set("spark.graft.folds.componentTable", tmp)
    try {
      val viaIndex = MiningQueries.q184DedupAwareFolds(spark, sfDir).collect().toSeq
      assert(viaIndex === direct,
        "fold split over the persisted index must equal the re-contracted split")
      // and the reused path really reads the index: its plan scans the
      // temp parquet instead of carrying a second contraction loop
      val plan = MiningQueries.q184DedupAwareFolds(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(tmp).getName), plan.take(2000))
    } finally spark.conf.unset("spark.graft.folds.componentTable")
  }

  test("q186: chunking is content-defined - a prepended token still " +
    "shares most chunks; fixed-width chunking would share none") {
    val rows = MiningQueries.q186ContentDefinedChunking(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalShared = rows.map(_.getAs[Long]("shared_chunks")).sum
    val totalTwin = rows.map(_.getAs[Long]("n_chunks_twin")).sum
    // CDC's promise: the majority of chunk mass survives a 1-token shift
    assert(totalShared * 2 > totalTwin,
      s"CDC resync failed: $totalShared shared of $totalTwin")
    // contrast: FIXED 8-token chunking on the same shifted pairs shares
    // (near) nothing — every boundary moves by one token
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
    val fixedShared = docs.map { case (_, t) =>
      val o = t.grouped(8).map(_.mkString(" ")).toSet
      val s = ("zz0pre" +: t).grouped(8).map(_.mkString(" ")).toSet
      o.intersect(s).size
    }.sum
    assert(fixedShared * 10 < totalShared,
      s"fixed chunking shared $fixedShared vs CDC $totalShared")
  }

  test("q176: kept events within a key are always > 6h apart; " +
    "burst sizes account for every event") {
    val rows = MiningQueries.q176EventDebounce(spark, sfDir).collect()
    val gapUs = 6L * 3600 * 1000000
    rows.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
      .foreach { case (_, rs) =>
        val times = rs.map(_.getAs[Long]("kept_us")).sorted
        times.sliding(2).foreach {
          case Array(a, b) => assert(b - a > gapUs)
          case _ =>
        }
      }
    val total = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull).count()
    assert(rows.map(_.getAs[Long]("burst_size")).sum === total)
  }

  test("q220: PMI ratio is the exact BigInt rational and output is " +
    "support-floored, positive-PMI, descending") {
    val rows = SparkEntry.queries("q220_pmi_collocations")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // recompute corpus totals once, driver-side
    val toks = Tables.documents(spark, sfDir)
      .select(split(trim(col("text")), "\\s+").as("toks"))
      .collect().map(_.getSeq[String](0))
    val tTot = BigInt(toks.map(_.size.toLong).sum)
    val bTot = BigInt(toks.map(t => math.max(0, t.size - 1).toLong).sum)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val bi = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val (c12, c1, c2) = (r.getAs[Long]("c12"), r.getAs[Long]("c1"),
        r.getAs[Long]("c2"))
      assert(c12 >= 5 && c12 === bi((w1, w2)).toLong)
      assert(c1 === uni(w1).toLong && c2 === uni(w2).toLong)
      val expect = (BigInt(c12) * tTot * tTot * 1000000 /
        (BigInt(c1) * c2 * bTot)).toLong
      assert(r.getAs[Long]("pmi_ratio_ppm") === expect)
      assert(expect > 1000000L, "pmi must be positive")
      assert(expect <= prev, "rows must be ratio-descending")
      prev = expect
    }
  }

  test("q300: projection invariants — co-counts bounded by both posting " +
    "sizes, Jaccard replays from the counts, per-doc cap holds") {
    val rows = MiningQueries.q300TermProjection(spark, sfDir).collect()
    assert(rows.nonEmpty, "projection empty - governance cut everything")
    rows.foreach { r =>
      val (co, da, db) = (r.getAs[Long]("co_docs"), r.getAs[Long]("df_a"),
        r.getAs[Long]("df_b"))
      assert(co >= 2 && co <= math.min(da, db))
      assert(r.getAs[String]("term_a") < r.getAs[String]("term_b"))
      assert(r.getAs[Long]("jaccard_ppm") ===
        BigInt(co) * 1000000 / (da + db - co))
    }
    // descending co-count with (term_a, term_b) tiebreak - a total order,
    // so the LIMIT head is deterministic
    val keys = rows.map(r => (-r.getAs[Long]("co_docs"),
      r.getAs[String]("term_a"), r.getAs[String]("term_b"))).toSeq
    assert(keys === keys.sorted)
  }

  test("q347: session baskets replay driver-side (30-min-gap sessions, " +
    "pair counts, lift) and obey the support laws") {
    val rows = SparkEntry.queries("q347_session_baskets")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // driver-side sessionization: 30-minute gap on each user's timeline
    val baskets = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(_._2)
      var sid = 0L; var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev >= 30L * 60 * 1000000)
          sid += 1
        prev = e._2
        ((e._1, sid), e._3)
      }
    }.toSeq.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val nSess = baskets.length.toLong
    def nT(t: String) = baskets.count(_.contains(t)).toLong
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val nab = baskets.count(s => s.contains(a) && s.contains(b)).toLong
      assert(r.getAs[Long]("n_ab") === nab, s"n_ab for ($a,$b)")
      assert(r.getAs[Long]("n_a") === nT(a))
      assert(r.getAs[Long]("n_b") === nT(b))
      assert(nab <= math.min(nT(a), nT(b)))
      assert(r.getAs[Long]("support_ppm") ===
        BigInt(nab) * 1000000 / nSess)
      assert(r.getAs[Long]("lift_ppm") ===
        (BigInt(nab) * nSess * 1000000 / (BigInt(nT(a)) * nT(b))).toLong)
    }
  }

  test("q359: stationary distribution replays the 3 unrolled iterations " +
    "in BigInt, sums to ~1e6, and zero-out-degree states self-loop") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }.toSeq.groupBy(identity).view.mapValues(p => BigInt(p.size)).toMap
    val states = ev.map(_._4).distinct.sorted
    val rowsum = states.map(s =>
      s -> trans.collect { case ((a, _), c) if a == s => c }.sum).toMap
    val p = scala.collection.mutable.Map.empty[(String, String), BigInt]
    trans.foreach { case ((a, b), c) =>
      p((a, b)) = c * 1000000 / rowsum(a) }
    rowsum.collect { case (s, rs) if rs == 0 => p((s, s)) = BigInt(1000000) }
    var v = states.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 3) {
      val raw = states.map { t =>
        t -> states.map(s => v(s) * p.getOrElse((s, t), BigInt(0))).sum /
          1000000 }.toMap
      val tot = raw.values.sum
      v = states.map(t => t -> raw(t) * 1000000 / tot).toMap
    }
    val rows = SparkEntry.queries("q359_markov_stationary")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq === states)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(BigInt(r.getAs[Long]("out_transitions")) === rowsum(s))
      assert(BigInt(r.getAs[Long]("pi_ppm")) === v(s), s"pi $s")
    }
    val mass = rows.map(_.getAs[Long]("pi_ppm")).sum
    assert(mass > 1000000L - rows.length && mass <= 1000000L,
      s"mass $mass not within truncation bleed of 1e6")
  }

  test("q360: the md5 cap, pair counts and Jaccard replay driver-side, " +
    "no pair exceeds min degree, and the top-100 order is deterministic") {
    val cp = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val capped = cp.groupBy(_._2).toSeq.flatMap { case (part, cs) =>
      cs.sortBy(c => (md5hex(s"${c._1}_$part"), c._1)).take(32)
        .map(c => (c._1, part))
    }
    val deg = capped.groupBy(_._1).view.mapValues(v => v.size.toLong).toMap
    val byPart = capped.groupBy(_._2)
    val pairCounts = byPart.values.flatMap { ps =>
      val cs = ps.map(_._1).sorted
      for (i <- cs.indices; j <- (i + 1) until cs.length)
        yield (cs(i), cs(j))
    }.groupBy(identity).view.mapValues(v => v.size.toLong).toMap
    val rows = SparkEntry.queries("q360_copurchase_affinity")(spark, sfDir)
      .collect()
    assert(rows.length === math.min(100, pairCounts.size))
    // the result must be exactly the driver-side top-100 under the total
    // order (common desc, jaccard desc, cust_a, cust_b)
    val scored = pairCounts.toSeq.map { case ((a, b), c) =>
      val j = c * 1000000L / (deg(a) + deg(b) - c)
      (a, b, c, j)
    }.sortBy { case (a, b, c, j) => (-c, -j, a, b) }.take(100)
    rows.zip(scored).foreach { case (r, (a, b, c, j)) =>
      assert(r.getAs[Long]("cust_a") === a)
      assert(r.getAs[Long]("cust_b") === b)
      assert(r.getAs[Long]("n_common") === c)
      assert(r.getAs[Long]("jaccard_ppm") === j)
      assert(c <= math.min(deg(a), deg(b)))
    }
  }
}
