package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusQueries, CurationQueries, EvalQueries}

/** Invariant tests for the in-engine model-evaluation tier (q206–q208).
  * The DuckDB oracle gates bit-exactness; these pin the statistical claims
  * against independent driver-side recomputation.
  */
class EvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val scoreLabel: Array[(Long, Long, Long)] = {
    val s = CurationQueries.q136QualityClassifier(spark, sfDir)
      .select("doc_id", "score_sum").as[(Long, Long)].collect().toMap
    CurationQueries.q78QualityRepetition(spark, sfDir)
      .select(col("doc_id"), col("keep").cast("long"))
      .as[(Long, Long)].collect()
      .map { case (id, y) => (id, s(id), y) }
  }

  test("q206: importance tracks the planted target shift — docs leaning " +
    "on even-bucket tokens outscore the rest, and keep is the score sign") {
    val rows = CorpusQueries.q206DsirImportance(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert((r.getAs[Int]("keep_flag") == 1) ===
        (r.getAs[Long]("score_sum") >= 0))
    }
    // the LLR table must not have quantized flat — the planted 2× shift
    // has to survive whole-bit resolution
    assert(rows.map(_.getAs[Long]("score_sum")).distinct.length > 1,
      "all docs scored identically — the target shift is invisible")
    // driver-side recount: per-doc even-md5-bucket token share; the
    // score must order with it (top-share quartile above bottom quartile)
    def evenShare(text: String): Double = {
      val toks = text.trim.split("\\s+")
      val md = java.security.MessageDigest.getInstance("MD5")
      val even = toks.count { t =>
        val h = md.digest(t.getBytes("UTF-8")).take(4)
          .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
        h % 2 == 0
      }
      even.toDouble / toks.length
    }
    val shares = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> evenShare(t) }.toMap
    val scored = rows.map(r =>
      (shares(r.getAs[Long]("doc_id")), r.getAs[Double]("imp_per_token")))
      .sortBy(_._1)
    val q = scored.length / 4
    val low = scored.take(q).map(_._2); val high = scored.takeRight(q).map(_._2)
    assert(high.sum / high.length > low.sum / low.length,
      "even-bucket-leaning docs do not outscore — importance is noise")
  }

  test("q207: equal-depth bins partition the corpus; per-bin counts agree " +
    "with a driver-side replay") {
    val rows = EvalQueries.q207ReliabilityDeciles(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq === (0L to 9L))
    val n = scoreLabel.length
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    // equal depth: every bin holds n/10 rows, ±1 for the remainder
    rows.foreach(r => assert(math.abs(r.getAs[Long]("n_docs") - n / 10L) <= 1))
    // per-bin positives from an independent driver-side ranking
    val sorted = scoreLabel.sortBy { case (id, s, _) => (s, id) }
    val expected = sorted.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
      .view.mapValues(_.map(_._1._3).sum).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") === expected(r.getAs[Long]("bin")))
    }
  }

  test("q208: exact AUC equals the brute-force pairwise Mann–Whitney " +
    "statistic") {
    val row = EvalQueries.q208AucExact(spark, sfDir).collect().head
    val pos = scoreLabel.filter(_._3 == 1L).map(_._2)
    val neg = scoreLabel.filter(_._3 == 0L).map(_._2)
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    var conc = 0L; var tied = 0L
    for (p <- pos; q <- neg) {
      if (p > q) conc += 1 else if (p == q) tied += 1
    }
    assert(row.getAs[Long]("n_concordant_pairs") === conc)
    assert(row.getAs[Long]("n_tied_pairs") === tied)
    val aucPpm = (BigInt(2) * conc + tied) * 1000000 /
      (BigInt(2) * pos.length * neg.length)
    assert(row.getAs[Long]("auc_ppm") === aucPpm.toLong)
    // both classes populated and the statistic non-degenerate (the
    // stand-in model's AUC is NOT asserted above 0.5 — its weights are a
    // deterministic formula, not a trained fit; exactness is the claim)
    assert(aucPpm > 0 && aucPpm < 1000000)
  }

  test("q210: the S-curve trade-off is monotone across configs — fewer, " +
    "longer bands mean fewer candidates, better precision, weaker recall") {
    val rows = EvalQueries.q210LshParamAudit(spark, sfDir).collect()
      .sortBy(-_.getAs[Int]("bands")) // (16,2) → (8,4) → (4,8)
    assert(rows.map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")))
      .toSeq === EvalQueries.LshConfigs)
    val cand = rows.map(_.getAs[Long]("n_candidates"))
    val prec = rows.map(_.getAs[Long]("precision_ppm"))
    val rec = rows.map(_.getAs[Long]("recall_ppm"))
    assert(cand.zip(cand.tail).forall { case (a, b) => a >= b },
      s"candidates not shrinking: ${cand.toSeq}")
    assert(prec.zip(prec.tail).forall { case (a, b) => a <= b },
      s"precision not improving: ${prec.toSeq}")
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b },
      s"recall not weakening: ${rec.toSeq}")
    // the catch-everything config must actually catch everything on the
    // gate corpus, or the audit's ground truth is mislabeled
    assert(rec.head === 1000000L)
    assert(rows.head.getAs[Long]("n_true_pairs") > 0)
  }

  test("q215: the 2x2 confusion and Cohen's kappa match a driver-side " +
    "recount, and kappa sits strictly below raw agreement") {
    val row = EvalQueries.q215CohensKappa(spark, sfDir).collect().head
    val ab = scoreLabel.map { case (_, s, y) => (y, if (s >= 0) 1L else 0L) }
    val n = ab.length.toLong
    val n11 = ab.count { case (a, b) => a == 1 && b == 1 }.toLong
    val n10 = ab.count { case (a, b) => a == 1 && b == 0 }.toLong
    val n01 = ab.count { case (a, b) => a == 0 && b == 1 }.toLong
    val n00 = ab.count { case (a, b) => a == 0 && b == 0 }.toLong
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("n_both_keep") === n11)
    assert(row.getAs[Long]("n_gate_only") === n10)
    assert(row.getAs[Long]("n_clf_only") === n01)
    assert(row.getAs[Long]("n_both_drop") === n00)
    val po = BigInt(n11 + n00) * 1000000 / n
    val src = BigInt(n11 + n10) * (n11 + n01) + BigInt(n01 + n00) * (n10 + n00)
    val pe = src * 1000000 / (BigInt(n) * n)
    val kappa = (BigInt(n) * (n11 + n00) - src) * 1000000 / (BigInt(n) * n - src)
    assert(row.getAs[Long]("po_ppm") === po.toLong)
    assert(row.getAs[Long]("pe_ppm") === pe.toLong)
    assert(row.getAs[Long]("kappa_ppm") === kappa.toLong)
    // chance-corrected agreement must sit strictly below raw agreement
    // (pe > 0 always holds for non-degenerate marginals), and within
    // kappa's defined range
    assert(kappa < po, s"kappa $kappa not below raw agreement $po")
    assert(kappa >= -1000000L && kappa <= 1000000L)
  }

  test("q219: chi-square matches a driver-side float recompute (floor at " +
    "milli precision) and contingency margins are consistent") {
    val rows = SparkEntry.queries("q219_chi2_source_drift")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val n0 = rows.head.getAs[Long]("n")
    rows.foreach { r =>
      val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("c"), r.getAs[Long]("d"))
      assert(a + b + c + d === n0, "every row must see the same grand total")
      val chi = r.getAs[Long]("chi2_milli")
      val det = a.toDouble * d - b.toDouble * c
      val expect = n0.toDouble * det * det * 1000.0 /
        ((a + b).toDouble * (c + d) * (a + c) * (b + d))
      assert(math.abs(chi - math.floor(expect)) <= 1,
        s"source ${r.getAs[String]("source")}: chi2_milli $chi vs float $expect")
      assert(r.getAs[Boolean]("significant") === (chi > 3841L))
    }
  }

  test("q232: bootstrap CI is ordered, replica count is 32, and the point " +
    "estimate is the exact corpus keep-rate") {
    val r = SparkEntry.queries("q232_poisson_bootstrap")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("b_reps") === 32L)
    val (lo, hi, pt) = (r.getAs[Long]("ci_lo_ppm"), r.getAs[Long]("ci_hi_ppm"),
      r.getAs[Long]("point_ppm"))
    assert(lo <= hi)
    assert(lo >= 0L && hi <= 1000000L)
    // the point estimate is deterministic — recount it
    val keep = graft.queries.CurationQueries
      .q78QualityRepetition(spark, sfDir)
      .agg(sum(col("keep").cast("long")), count(lit(1))).collect().head
    assert(pt === keep.getLong(0) * 1000000L / keep.getLong(1))
    // a sane bootstrap brackets the point estimate on this fixture
    assert(lo <= pt && pt <= hi,
      s"CI [$lo, $hi] does not bracket the point estimate $pt")
  }

  test("q238: exactly one best stump, it attains the maximum score, and " +
    "one candidate cell recounts exactly") {
    val rows = SparkEntry.queries("q238_decision_stump")(spark, sfDir)
      .collect()
    assert(rows.length ===
      2 * graft.queries.EvalQueries.StumpThresholds.size)
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.length === 1)
    val scores = rows.flatMap(r => Option(r.getAs[java.lang.Long]("score_q")))
      .map(_.toLong)
    assert(best.head.getAs[Long]("score_q") === scores.max)
    // recount the (n_tokens, 30) candidate from raw data
    val cell = rows.find(r => r.getAs[String]("feature") == "n_tokens" &&
      r.getAs[Long]("threshold") == 30L).get
    val j = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("v"))
      .join(graft.queries.CurationQueries.q78QualityRepetition(spark, sfDir)
        .select(col("doc_id"), col("keep").cast("long").as("y")), "doc_id")
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("y")))
    assert(cell.getAs[Long]("n_l") === j.count(_._1 <= 30).toLong)
    assert(cell.getAs[Long]("p_l") ===
      j.filter(_._1 <= 30).map(_._2).sum)
    assert(cell.getAs[Long]("n_r") === j.count(_._1 > 30).toLong)
    // and the score formula holds for that cell
    val (nl, pl, nr, pr) = (BigInt(cell.getAs[Long]("n_l")),
      BigInt(cell.getAs[Long]("p_l")), BigInt(cell.getAs[Long]("n_r")),
      BigInt(cell.getAs[Long]("p_r")))
    val expect = ((pl * pl + (nl - pl) * (nl - pl)) * 1000000 / nl +
      (pr * pr + (nr - pr) * (nr - pr)) * 1000000 / nr).toLong
    assert(cell.getAs[Long]("score_q") === expect)
  }

  test("q289: threshold is the exact conformal rank statistic (driver " +
    "replay), slices partition each language, and coverage honors the " +
    "distribution-free guarantee") {
    import spark.implicits._
    val rows = EvalQueries.q289ConformalCalibration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver replay: same scores via q136, same md5 bucket rule
    val scored = CurationQueries.q136QualityClassifier(spark, sfDir)
      .select(col("doc_id"), col("score_sum"))
      .join(Tables.documents(spark, sfDir).select("doc_id", "lang"), "doc_id")
      .as[(Long, Long, String)].collect()
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(2).map("%02x".format(_)).mkString, 16) % 16
    }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val inLang = scored.filter(_._3 == lang)
      val cal = inLang.filter(t => bucket(t._1) < 4)
        .sortBy(t => (t._2, t._1)).map(_._2)
      val test = inLang.filter(t => bucket(t._1) >= 4).map(_._2)
      assert(r.getAs[Long]("n_cal") === cal.length.toLong, lang)
      assert(r.getAs[Long]("n_test") === test.length.toLong, lang)
      assert(cal.length + test.length === inLang.length, lang)
      val qidx = ((cal.length + 1) * 9 + 9) / 10
      assert(r.getAs[Long]("cal_q_index") === qidx.toLong, lang)
      val thr = cal(math.min(qidx, cal.length) - 1)
      assert(r.getAs[Long]("threshold") === thr, lang)
      assert(r.getAs[Long]("n_covered") === test.count(_ <= thr).toLong, lang)
      // exchangeable synthetic data: realized coverage sits near the 90%
      // target the rank statistic promises (loose floor, deterministic)
      assert(r.getAs[Long]("coverage_ppm") >= 800000L,
        s"$lang coverage collapsed: $r")
    }
  }

  test("q324: Krippendorff alpha replays from driver-side labels and the " +
    "coincidence identities hold") {
    val row = SparkEntry.queries("q324_krippendorff_alpha")(spark, sfDir)
      .collect().head
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("n_chars"), coalesce(col("text"), lit("")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def b3(x: Long, lo: Long, hi: Long): Long =
      if (x < lo) 0L else if (x < hi) 1L else 2L
    val labels = docs.map { case (nc, t) =>
      val periods = (t.length - t.replace(".", "").length).toLong
      val spaces = (t.length - t.replace(" ", "").length).toLong
      (b3(nc, 200, 400), b3(periods, 3, 6), b3(spaces, 30, 60))
    }
    val n = labels.length.toLong
    assert(row.getAs[Long]("n_units") === n)
    assert(row.getAs[Long]("t_total") === 3 * n)
    val offpairs = labels.map { case (a, b, c) =>
      2L * (Seq(a != b, a != c, b != c).count(identity))
    }.sum
    assert(row.getAs[Long]("offpairs") === offpairs)
    val marg = labels.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map(_._2.length.toLong)
    assert(row.getAs[Long]("sumsq") === marg.map(x => x * x).sum)
    val t = 3 * n
    val sumsq = marg.map(x => x * x).sum
    val num = 2 * (t * t - sumsq) - offpairs * (t - 1)
    val den = 2 * (t * t - sumsq)
    assert(row.getAs[Long]("alpha_num") === num)
    assert(row.getAs[Long]("alpha_den") === den)
    // alpha <= 1 always; the three length-correlated raters must agree
    // far above chance on synthetic prose (alpha > 0)
    assert(num <= den && num > 0)
    val ppm = if (num >= 0) BigInt(num) * 1000000 / den
      else -(BigInt(-num) * 1000000 / den)
    assert(BigInt(row.getAs[Long]("alpha_ppm")) === ppm)
  }

  test("q330: McNemar cells conserve the corpus and the discordant counts " +
    "replay driver-side") {
    val row = SparkEntry.queries("q330_mcnemar")(spark, sfDir).collect().head
    val cells = Seq("n_both", "b_discord", "c_discord", "n_neither")
      .map(row.getAs[Long])
    assert(cells.sum === row.getAs[Long]("n_units"))
    val raters = Tables.documents(spark, sfDir)
      .select(col("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getLong(0) >= 300, r.getLong(1) >= 45))
    assert(row.getAs[Long]("b_discord") ===
      raters.count { case (a, b) => a && !b }.toLong)
    assert(row.getAs[Long]("c_discord") ===
      raters.count { case (a, b) => !a && b }.toLong)
    val (b, c) = (row.getAs[Long]("b_discord"), row.getAs[Long]("c_discord"))
    if (b + c > 0) {
      val chi2 = BigInt(b - c) * (b - c) * 1000000 / (b + c)
      assert(BigInt(row.getAs[Long]("chi2_ppm")) === chi2)
      assert(row.getAs[Long]("reject_95") ===
        (if (BigInt(b - c) * (b - c) * 1000000 > BigInt(3841459) * (b + c)) 1L
         else 0L))
    }
  }

  test("q331: AP is a valid ppm, beats-or-meets nothing it shouldn't, and " +
    "its class counts agree with q208's") {
    val ap = SparkEntry.queries("q331_average_precision")(spark, sfDir)
      .collect().head
    val auc = SparkEntry.queries("q208_auc_exact")(spark, sfDir)
      .collect().head
    assert(ap.getAs[Long]("n_pos") === auc.getAs[Long]("n_pos"))
    assert(ap.getAs[Long]("n") ===
      auc.getAs[Long]("n_pos") + auc.getAs[Long]("n_neg"))
    val apPpm = ap.getAs[Long]("ap_ppm")
    val prior = ap.getAs[Long]("prior_ppm")
    assert(apPpm >= 0 && apPpm <= 1000000)
    assert(prior >= 0 && prior <= 1000000)
    // prevalence replay: prior = n_pos * 1e6 div n
    assert(prior === BigInt(ap.getAs[Long]("n_pos")) * 1000000 /
      ap.getAs[Long]("n"))
  }

  test("q338: the confusion matrix conserves both classes, J replays from " +
    "it, and the optimum dominates the trivial thresholds") {
    val r = SparkEntry.queries("q338_youden_threshold")(spark, sfDir)
      .collect().head
    val (np, nn) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === np)
    assert(r.getAs[Long]("fp") + r.getAs[Long]("tn") === nn)
    val jNum = BigInt(r.getAs[Long]("tp")) * nn -
      BigInt(r.getAs[Long]("fp")) * np
    val jPpm = if (jNum >= 0) (jNum * 1000000 / (BigInt(np) * nn)).toLong
      else -(((-jNum) * 1000000) / (BigInt(np) * nn)).toLong
    assert(r.getAs[Long]("j_ppm") === jPpm)
    // "classify nothing positive" scores J = 0, so the optimum is >= 0
    assert(r.getAs[Long]("j_ppm") >= 0 && r.getAs[Long]("j_ppm") <= 1000000)
    // class counts agree with q208's
    val auc = SparkEntry.queries("q208_auc_exact")(spark, sfDir)
      .collect().head
    assert(np === auc.getAs[Long]("n_pos") && nn === auc.getAs[Long]("n_neg"))
  }

  test("q351: confusion suite replays from a driver-side lang-id rerun — " +
    "cells conserve the corpus and F1 is the exact ppm harmonic mean") {
    val profiles = graft.functions.TextFunctions.langProfiles
    def predict(text: String): String = {
      val toks = text.trim.split("\\s+")
      val hits = profiles.map { case (l, ws) =>
        l -> toks.count(ws.contains) }
      val langs = hits.map(_._1)
      langs.zipWithIndex.collectFirst { case (l, i)
        if hits.take(i).forall(hits(i)._2 > _._2) &&
           hits.drop(i + 1).forall(hits(i)._2 >= _._2) => l }
        .getOrElse("und")
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), predict(r.getString(1))))
    val rows = SparkEntry.queries("q351_confusion_suite")(spark, sfDir)
      .collect()
    val micro = rows.filter(_.getString(0) == "~micro")
    assert(micro.length === 1)
    val per = rows.filterNot(_.getString(0) == "~micro")
    // conservation: label and pred counts both sum to the corpus
    assert(per.map(_.getAs[Long]("n_label")).sum === docs.length.toLong)
    assert(per.map(_.getAs[Long]("n_pred")).sum === docs.length.toLong)
    assert(micro.head.getAs[Long]("tp") ===
      docs.count { case (l, p) => l == p }.toLong)
    per.foreach { r =>
      val cls = r.getString(0)
      val tp = docs.count { case (l, p) => l == cls && p == cls }.toLong
      val nl = docs.count(_._1 == cls).toLong
      val np2 = docs.count(_._2 == cls).toLong
      assert(r.getAs[Long]("tp") === tp, s"tp $cls")
      assert(r.getAs[Long]("fp") === np2 - tp, s"fp $cls")
      assert(r.getAs[Long]("fn") === nl - tp, s"fn $cls")
      if (np2 + nl > 0)
        assert(r.getAs[Long]("f1_ppm") === 2000000L * tp / (np2 + nl),
          s"f1 $cls")
    }
  }

  test("q352: per-bin gaps and the ECE summary replay driver-side from " +
    "the raw score/label frame (untruncated sums)") {
    val rows = SparkEntry.queries("q352_calibration_gap")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("bin"))
    val sl = scoreLabel.sortBy(t => (t._2, t._1)) // (doc, score, y)
    val n = sl.length.toLong
    val lo = sl.map(_._2).min; val hi = sl.map(_._2).max
    def conf(s: Long): Long =
      if (hi == lo) 0L else (BigInt(s - lo) * 1000000 / (hi - lo)).toLong
    val binned = sl.zipWithIndex.groupBy { case (_, i) => i.toLong * 10 / n }
    val expect = binned.toSeq.sortBy(_._1).map { case (b, ds) =>
      val nPos = ds.map(_._1._3).sum
      val sumConf = ds.map(d => conf(d._1._2)).sum
      (b, ds.length.toLong, nPos, sumConf)
    }
    val perBin = rows.filter(_.getAs[Long]("bin") >= 0)
    assert(perBin.map(_.getAs[Long]("bin")).toSeq === expect.map(_._1))
    perBin.zip(expect).foreach { case (r, (b, nd, npos, sconf)) =>
      assert(r.getAs[Long]("n_docs") === nd, s"bin $b")
      assert(r.getAs[Long]("n_pos") === npos, s"bin $b")
      assert(r.getAs[Long]("avg_conf_ppm") === sconf / nd, s"bin $b")
      assert(r.getAs[Long]("gap_ppm") ===
        (sconf - 1000000L * npos).abs / nd, s"bin $b")
    }
    val ece = rows.filter(_.getAs[Long]("bin") == -1L).head
    assert(ece.getAs[Long]("n_docs") === n)
    assert(ece.getAs[Long]("gap_ppm") ===
      expect.map { case (_, _, npos, sconf) =>
        (sconf - 1000000L * npos).abs }.sum / n)
  }

  test("q353: CUPED theta and both mean differences replay in BigInt " +
    "from the raw events, and adjustment removes pre-period imbalance") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, Long, Long)].collect()
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      (u % 2, es.filter(_._2 < cut).map(_._3).sum,
        es.filter(_._2 >= cut).map(_._3).sum)
    }.toSeq
    val n = BigInt(byUser.size)
    val sx = byUser.map(e => BigInt(e._2)).sum
    val sy = byUser.map(e => BigInt(e._3)).sum
    val sxy = byUser.map(e => BigInt(e._2) * e._3).sum
    val sxx = byUser.map(e => BigInt(e._2) * e._2).sum
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val r = SparkEntry.queries("q353_cuped")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_users") === byUser.size.toLong)
    val t = byUser.filter(_._1 == 1); val c = byUser.filter(_._1 == 0)
    assert(r.getAs[Long]("n_treat") === t.size.toLong)
    if (den == 0) assert(r.isNullAt(r.fieldIndex("theta_ppm")))
    else {
      val theta = sdiv(num * 1000000, den)
      assert(BigInt(r.getAs[Long]("theta_ppm")) === theta)
      val diffRaw =
        sdiv(t.map(e => BigInt(e._3)).sum * 1000000, t.size) -
        sdiv(c.map(e => BigInt(e._3)).sum * 1000000, c.size)
      val xdiff =
        sdiv(t.map(e => BigInt(e._2)).sum * 1000000, t.size) -
        sdiv(c.map(e => BigInt(e._2)).sum * 1000000, c.size)
      assert(BigInt(r.getAs[Long]("diff_raw_micro")) === diffRaw)
      assert(BigInt(r.getAs[Long]("diff_cuped_micro")) ===
        diffRaw - sdiv(theta * xdiff, 1000000))
    }
  }

  test("q354: MDE replays in BigInt (variance numerator, isqrt, scale) " +
    "and shrinks with volume as 1/sqrt(n)") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    def isqrt(v: BigInt): BigInt =
      if (v <= 0) BigInt(0) else {
        var r = BigInt(math.sqrt(v.toDouble).toLong)
        while (r * r > v) r -= 1
        while ((r + 1) * (r + 1) <= v) r += 1
        r
      }
    val rows = SparkEntry.queries("q354_mde_audit")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ty = r.getString(0)
      val cs = ev.filter(_._1 == ty).map(t => BigInt(t._2))
      val n = BigInt(cs.length)
      assert(r.getAs[Long]("n_events") === cs.length.toLong)
      val varnum = n * cs.map(c => c * c).sum - cs.sum * cs.sum
      val w = isqrt(varnum / n)
      assert(BigInt(r.getAs[Long]("mde_micro")) === w * 5603200 / n,
        s"mde $ty")
    }
  }

  test("q366: HT membership, weights and signed error replay driver-side, " +
    "and the estimator is exactly unbiased over md5 strata by replay") {
    def p32(s2: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        d.digest(s2.getBytes("UTF-8")).take(4).map("%02x".format(_))
          .mkString, 16)
    }
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val rows = SparkEntry.queries("q366_horvitz_thompson")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val ty = r.getString(0)
      val rate = 62500L * (1 + p32(ty) % 8)
      assert(r.getAs[Long]("rate_ppm") === rate)
      val mine = ev.filter(_._1 == ty)
      val sampled = mine.filter(e =>
        BigInt(p32(e._2.toString)) * 1000000 < BigInt(rate) * 4294967296L)
      assert(r.getAs[Long]("n_total") === mine.length.toLong)
      assert(r.getAs[Long]("n_sampled") === sampled.length.toLong)
      val sc = sampled.map(e => BigInt(e._3)).sum
      val ht = if (sc >= 0) sc * 1000000 / rate else -((-sc) * 1000000 / rate)
      assert(BigInt(r.getAs[Long]("ht_cents")) === ht)
      val truth = mine.map(e => BigInt(e._3)).sum
      assert(BigInt(r.getAs[Long]("true_cents")) === truth)
      if (truth != 0) {
        val diff = ht - truth
        val err = if (diff >= 0) diff * 1000000 / truth.abs
          else -((-diff) * 1000000 / truth.abs)
        assert(BigInt(r.getAs[Long]("err_ppm")) === err)
      }
    }
  }

  test("q367: each decile's per-arm quantile is the exact order statistic " +
    "under the 10*cum >= d*n convention, and deciles are monotone") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, Long, Long)].collect()
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val byArm = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (u % 2, es.filter(_._2 >= cut).map(_._3).sum) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def quantile(vs: Seq[Long], d: Long): Long = {
      val n = vs.length.toLong
      vs.zipWithIndex.collectFirst {
        case (v, i) if 10L * (i + 1) >= d * n => v }.get
    }
    val rows = SparkEntry.queries("q367_quantile_effects")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (1L to 9L))
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      val tv = quantile(byArm(1L), d); val cv = quantile(byArm(0L), d)
      assert(r.getAs[Long]("treat_v") === tv, s"treat d$d")
      assert(r.getAs[Long]("ctrl_v") === cv, s"ctrl d$d")
      assert(r.getAs[Long]("qte_cents") === tv - cv)
    }
    // order statistics are monotone in d per arm
    val tvs = rows.map(_.getAs[Long]("treat_v"))
    assert(tvs.zip(tvs.tail).forall { case (a, b) => a <= b })
  }

  test("q368: slice rates replay from the score/label/lang frame, the " +
    "~all row pools exactly, and gaps are zero on the pooled row") {
    val langOf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val sl = scoreLabel.map { case (id, s, y) =>
      (langOf(id), y, if (s >= 0) 1L else 0L) }
    val rows = SparkEntry.queries("q368_fairness_slices")(spark, sfDir)
      .collect()
    val all = rows.filter(_.getString(0) == "~all")
    assert(all.length === 1)
    assert(all.head.getAs[Long]("n") === sl.length.toLong)
    assert(all.head.getAs[Long]("dp_gap_ppm") === 0L)
    assert(all.head.getAs[Long]("eo_gap_ppm") === 0L)
    val gSel = all.head.getAs[Long]("sel_ppm")
    rows.filterNot(_.getString(0) == "~all").foreach { r =>
      val mine = sl.filter(_._1 == r.getString(0))
      assert(r.getAs[Long]("n") === mine.length.toLong)
      val nSel = mine.map(_._3).sum
      assert(r.getAs[Long]("sel_ppm") === nSel * 1000000L / mine.length)
      assert(r.getAs[Long]("dp_gap_ppm") ===
        r.getAs[Long]("sel_ppm") - gSel)
      val nPos = mine.map(_._2).sum
      if (nPos > 0) {
        val tp = mine.filter(m => m._2 == 1L && m._3 == 1L).size.toLong
        assert(r.getAs[Long]("tpr_ppm") === tp * 1000000L / nPos)
      }
    }
  }
}
