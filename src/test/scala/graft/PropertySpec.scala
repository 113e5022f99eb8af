package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Credentials
import graft.store.Upsert
import graft.transform.Transforms

/** Property-based invariants (SURVEY §5): algebraic laws of the core
  * operators over scalacheck-generated inputs (seeded, so runs are
  * reproducible), not just fixed examples.
  */
class PropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val a = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  private val kvRows: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.alphaStr.map(_.take(5))))

  test("Upsert law: staging keys come only from staging; other keys untouched") {
    samples(Gen.zip(kvRows, kvRows), 10).foreach { case (t, s) =>
      val target = Transforms.dedupKeyed(t.toDF("id", "v"), Seq("id"), Seq(col("v")))
      val staging = Transforms.dedupKeyed(s.toDF("id", "v"), Seq("id"), Seq(col("v")))
      val out = Upsert(target, staging, Seq("id")).as[(Int, String)].collect().toMap
      val tm = target.as[(Int, String)].collect().toMap
      val sm = staging.as[(Int, String)].collect().toMap
      assert(out === tm ++ sm)
    }
  }

  test("Upsert is idempotent: applying the same staging twice changes nothing") {
    samples(Gen.zip(kvRows, kvRows), 5).foreach { case (t, s) =>
      val target = Transforms.dedupKeyed(t.toDF("id", "v"), Seq("id"), Seq(col("v")))
      val staging = Transforms.dedupKeyed(s.toDF("id", "v"), Seq("id"), Seq(col("v")))
      val once = Upsert(target, staging, Seq("id"))
      val twice = Upsert(once, staging, Seq("id"))
      assert(twice.orderBy("id", "v").collect().toSeq ===
        once.orderBy("id", "v").collect().toSeq)
    }
  }

  test("dedupKeyed keeps exactly one row per key, and it is the minimum") {
    samples(kvRows.suchThat(_.nonEmpty), 10).foreach { rows =>
      val out = Transforms.dedupKeyed(rows.toDF("id", "v"), Seq("id"), Seq(col("v")))
        .as[(Int, String)].collect()
      assert(out.map(_._1).distinct.length === out.length)
      val expect = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      assert(out.toMap === expect)
    }
  }

  test("credential crypto roundtrips arbitrary printable passwords") {
    val keyHex = "00112233445566778899aabbccddeeff00112233445566778899aabbccddeeff"
    val ivHex = "0102030405060708090a0b0c"
    val pwGen = Gen.asciiPrintableStr.map(_.take(40).filterNot(_ == '"'))
    samples(pwGen, 50).foreach { pw =>
      val (ct, tag) = Credentials.encryptPassword(pw, keyHex, ivHex)
      assert(Credentials.decryptPassword(ct, tag, keyHex, ivHex) === pw)
    }
  }

  test("jaccard is bounded, reflexive, and symmetric on token sets") {
    val tokenSets = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
      .map(_.distinct)
    samples(Gen.zip(tokenSets, tokenSets), 15).foreach { case (x, y) =>
      val (j, jr, jid) = Seq((x, y)).toDF("a", "b").select(
        graft.functions.Similarity.jaccard(col("a"), col("b")),
        graft.functions.Similarity.jaccard(col("b"), col("a")),
        graft.functions.Similarity.jaccard(col("a"), col("a")))
        .as[(Double, Double, Double)].head()
      assert(j >= 0.0 && j <= 1.0)
      assert(j === jr)
      assert(jid === 1.0)
    }
  }

  test("scd2Historize laws: contiguous intervals, one current version, changes real") {
    val rows: Gen[List[(Int, Int, String)]] =
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 4), Gen.choose(0, 99),
        Gen.oneOf("A", "B", "C")))
    samples(rows, 8).foreach { data =>
      // unique (k, t): keep first occurrence so the order is total
      val in = data.distinctBy(r => (r._1, r._2)).toDF("k", "t", "attr")
      val hist = Transforms.scd2Historize(in, Seq("k"), Seq("attr"), "t")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
          Option(r.get(3)).map(_.asInstanceOf[Int]), r.getBoolean(4), r.getInt(5)))
        .groupBy(_._1)
      hist.foreach { case (k, vs) =>
        val sorted = vs.sortBy(_._6)
        // intervals tile: version i's valid_to == version i+1's valid_from
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.contains(b._3), s"key $k: gap between versions $a -> $b")
            assert(a._2 != b._2, s"key $k: consecutive versions with equal attr")
          case _ =>
        }
        // exactly the last version is open/current
        assert(sorted.count(_._5) === 1 && sorted.last._5 && sorted.last._4.isEmpty)
      }
    }
  }

  test("scd2Historize and dedupKeyed accept empty input") {
    val empty = Seq.empty[(Int, Int, String)].toDF("k", "t", "attr")
    assert(Transforms.scd2Historize(empty, Seq("k"), Seq("attr"), "t").count() === 0)
    assert(Transforms.dedupKeyed(empty, Seq("k"), Seq(col("t"))).count() === 0)
  }

  test("CDC roundtrip law: ApplyChangelog(old, ChangeFeed(old, new)) == new") {
    import graft.store.{ApplyChangelog, ChangeFeed}
    samples(Gen.zip(kvRows, kvRows), 8).foreach { case (o, n) =>
      val old = Transforms.dedupKeyed(o.toDF("id", "v"), Seq("id"), Seq(col("v")))
      val newer = Transforms.dedupKeyed(n.toDF("id", "v"), Seq("id"), Seq(col("v")))
      val feed = ChangeFeed(old, newer, Seq("id")).withColumn("seq", lit(1))
      val recovered = ApplyChangelog(old, feed, Seq("id"), "seq")
      assert(recovered.orderBy("id").collect().toSeq ===
        newer.orderBy("id").collect().toSeq)
    }
  }

  test("ChangeFeed classifies null keys and null-valued updates correctly") {
    import graft.store.ChangeFeed
    // a NULL key value matches itself across snapshots (the join is
    // null-safe) — an unchanged null-key row must emit NOTHING, a changed
    // one must emit U (not a spurious I); and an update that sets the
    // attr to NULL must carry the NEW (null) image, not the old value
    val old = Seq[(java.lang.Integer, java.lang.Integer)](
      (null, 10), (1, 1), (2, 2), (3, 3)).toDF("id", "v")
    val newer = Seq[(java.lang.Integer, java.lang.Integer)](
      (null, 10), (1, null), (3, 3), (4, 4)).toDF("id", "v")
    val feed = ChangeFeed(old, newer, Seq("id"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2)))
      .toSet
    assert(feed === Set(
      (Some(1), None, "U"),     // null-valued update keeps the new image
      (Some(2), Some(2), "D"),
      (Some(4), Some(4), "I"))) // the unchanged (null,10) row emits nothing
  }

  test("BandJoinRewrite law: random bands equal the naive join (negatives included)") {
    val vals: Gen[List[Long]] = Gen.listOfN(60, Gen.choose(-500L, 500L))
    val band: Gen[(Long, Long)] =
      Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 80L)).map { case (lo, w) => (lo, lo + w) }
    samples(Gen.zip(vals, vals, band), 6).foreach { case (ls, rs, (lo, hi)) =>
      val l = ls.zipWithIndex.map { case (t, i) => (i, t) }.toDF("lid", "lt")
      val r = rs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("rid", "rt")
      def run() = l.join(r, col("lt") >= col("rt") + lit(lo) &&
          col("lt") <= col("rt") + lit(hi))
        .select("lid", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
      val rewritten = run()
      // reference: the naive nested loop, computed in plain Scala
      val expected = (for {
        (lt, li) <- ls.zipWithIndex
        (rt, ri) <- rs.zipWithIndex
        if lt >= rt + lo && lt <= rt + hi
      } yield (li, ri)).toSet
      assert(rewritten === expected, s"band [$lo, $hi]")
    }
  }

  test("TopKRewrite law: rewritten window top-k equals the window plan exactly") {
    import org.apache.spark.sql.expressions.Window
    // (key, value, tie): tie is unique per row so row_number is total-order
    // deterministic and both plans must agree row for row
    val rows: Gen[List[(Int, Int)]] =
      Gen.listOfN(60, Gen.zip(Gen.choose(0, 6), Gen.choose(-50, 50)))
    samples(Gen.zip(rows, Gen.choose(1, 5)), 8).foreach { case (data, k) =>
      val df = data.zipWithIndex.map { case ((key, v), i) => (key, v, i) }
        .toDF("key", "v", "tie")
      val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("tie"))
      def run(): Seq[(Int, Int, Int, Int)] = df
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .orderBy(col("key"), col("rn"))
        .as[(Int, Int, Int, Int)].collect().toSeq
      val rewritten = run()
      assert(df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .queryExecution.optimizedPlan.toString.contains("GroupTopK"),
        "rewrite must fire on this pattern")
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val windowed = try run() finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(rewritten === windowed, s"k=$k")
    }
  }

  test("BPE round-trip law: pieces concatenate back to the input; " +
    "segment size equals token count (generated strings, UNK included)") {
    import graft.queries.TextQueries.BpeVocab
    // characters chosen to hit every walk regime: vocab-covered ASCII,
    // UNK ASCII (digits, hyphen), and multi-byte code points (where byte
    // and code-point indexing diverge — the regime a UTF8String substring
    // bug would corrupt)
    val wordChar: Gen[Char] = Gen.frequency(
      8 -> Gen.alphaLowerChar,
      2 -> Gen.oneOf('é', 'ß', '漢', '字', '-', '9', 'Q'))
    val word: Gen[String] = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, wordChar).map(_.mkString))
    val doc: Gen[List[String]] = Gen.choose(0, 8)
      .flatMap(n => Gen.listOfN(n, word))
    val rows = samples(doc, 300).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }
    val out = rows.toDF("id", "toks")
      .select(col("id"),
        concat_ws("", col("toks")).as("joined"),
        array_join(graft.expressions.BpeSegment
          .bpeSegment(col("toks"), BpeVocab), "").as("rebuilt"),
        size(graft.expressions.BpeSegment
          .bpeSegment(col("toks"), BpeVocab)).cast("long").as("n_seg"),
        graft.expressions.BpeTokenCount
          .bpeTokenCount(col("toks"), BpeVocab).as("n_cnt"))
      .collect()
    assert(out.length === 300)
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      // reconstruction: segmentation is a partition of the input — no
      // character lost, duplicated, or reordered, UNK fallback included
      assert(r.getAs[String]("rebuilt") === r.getAs[String]("joined"),
        s"row $id: pieces must concatenate back to the input")
      // count law: the count expression is the fold of the segment walk
      assert(r.getAs[Long]("n_seg") === r.getAs[Long]("n_cnt"),
        s"row $id: size(bpeSegment) must equal bpeTokenCount")
    }
  }

  test("q233 law: Hamilton apportionment sums EXACTLY to the budget for " +
    "every K (conf sweep over generated budgets)") {
    val ks = Gen.listOfN(8, Gen.choose(1L, 5000L))
      .apply(Gen.Parameters.default, Seed(233L)).get.distinct
    ks.foreach { k =>
      spark.conf.set("spark.graft.apportion.k", k.toString)
      try {
        val rows = SparkEntry.queries("q233_apportionment")(spark, sfDir)
          .collect()
        assert(rows.map(_.getAs[Long]("seats")).sum === k,
          s"K=$k: seats must sum to the budget exactly")
        rows.foreach(r => assert(r.getAs[Long]("extra") <= 1L))
      } finally spark.conf.unset("spark.graft.apportion.k")
    }
  }

  test("q251 law: the linear-counting table is strictly decreasing in the " +
    "empty-register count and anchored at the boundaries") {
    val t = graft.queries.ProfilingQueries.LcTable
    assert(t.length === 257)
    assert(t(256) === 0L, "all registers empty => estimate 0")
    assert(t(1) === math.round(256.0 * math.log(256.0)),
      "one empty register => densest LC estimate")
    (2 to 256).foreach { v =>
      assert(t(v) <= t(v - 1), s"LC($v) must not exceed LC(${v - 1})") }
  }

  test("q232 law: the Poisson(1) ppm quantiles are the exact CDF cutoffs " +
    "(e^-1 ladder) and multiplicities have mean ~1 under md5 uniformity") {
    // the fixed thresholds used by q232 (and its oracle)
    val thr = Seq(367879L, 735759L, 919699L, 981012L, 996340L)
    var cdf = 0.0
    var fact = 1.0
    thr.zipWithIndex.foreach { case (q, kk) =>
      if (kk > 0) fact *= kk
      cdf += math.exp(-1.0) / fact
      assert(math.abs(q - math.round(cdf * 1000000)) <= 1,
        s"P(X<=$kk) ppm mismatch: $q vs ${cdf * 1000000}")
    }
    // expected multiplicity: sum over k of k*P(k), truncated at 5
    val p = thr.map(_.toDouble / 1000000)
    val steps = p.head +: p.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    val probs = steps :+ (1.0 - p.last)
    val mean = probs.zipWithIndex.map { case (pr, k) => pr * k }.sum
    assert(math.abs(mean - 1.0) < 0.02, s"truncated-Poisson mean $mean")
  }

  test("q271 law: frontier merge == full contraction on random graphs " +
    "under every base/delta split") {
    import graft.functions.Similarity
    import graft.queries.GraphQueries
    // random small graphs: node ids 0..19, random edge lists; delta =
    // edges with any endpoint in a random residue class — the merge must
    // equal a from-scratch contraction of the WHOLE edge set every time
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    val cases = samples(Gen.zip(edgeGen, Gen.choose(2L, 5L)), 12)
    cases.foreach { case (edges0, mod) =>
      val edges = edges0.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val df = edges.toDF("id_a", "id_b")
        val isD = (x: Long) => x % mod == 0
        val base = edges.filter { case (a, b) => !isD(a) && !isD(b) }
        val delta = edges.filter { case (a, b) => isD(a) || isD(b) }
        val full = Similarity.connectedComponentsStar(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val baseLabels = Similarity.connectedComponentsStar(
          if (base.nonEmpty) base.toDF("id_a", "id_b")
          else Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
        val inc = GraphQueries.incrementalMerge(baseLabels,
          if (delta.nonEmpty) delta.toDF("id_a", "id_b")
          else Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(inc === full,
          s"edges=$edges mod=$mod base=$base delta=$delta")
      }
    }
  }

  test("Exact.sdiv matches sign-split truncating division and Exact.fdiv " +
    "matches floor division for generated (a, b) incl. negatives") {
    val pairs = samples(
      Gen.zip(Gen.choose(-1000000L, 1000000L), Gen.choose(1L, 9999L)), 120)
    // evaluate the SQL fragments through Spark itself — the property is
    // about what the generated SQL MEANS, not about a Scala reimpl
    val df = pairs.toDF("a", "b").selectExpr(
      "a", "b",
      graft.queries.Exact.sdiv("a", "b", "div") + " AS s",
      graft.queries.Exact.fdiv("a", "b") + " AS f")
    df.collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val expectS = if (a >= 0) a / b else -((-a) / b) // truncate to zero
      assert(r.getAs[Long]("s") === expectS, s"sdiv($a, $b)")
      assert(r.getAs[Long]("f") === Math.floorDiv(a, b), s"fdiv($a, $b)")
    }
  }

  test("Exact.isqrtStage returns the true integer square root for " +
    "generated radicands across magnitudes") {
    val vs = samples(Gen.oneOf(
      Gen.choose(0L, 1000L),
      Gen.choose(0L, 4000000000L),
      Gen.choose(0L, 4000000000000000000L)), 90)
    val df = graft.queries.Exact.isqrtStage("v", "w")(vs.toDF("v"))
    df.collect().foreach { r =>
      val v = r.getAs[Long]("v"); val w = r.getAs[Long]("w")
      assert(BigInt(w) * w <= BigInt(v), s"isqrt($v) = $w overshoots")
      assert(BigInt(w + 1) * (w + 1) > BigInt(v), s"isqrt($v) = $w undershoots")
    }
  }
}
