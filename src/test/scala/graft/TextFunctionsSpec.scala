package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fingerprint: equal texts equal, order-sensitive, stable across runs") {
    val df = Seq(
      "alpha beta gamma",
      "alpha beta gamma",
      "gamma beta alpha").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2), "fingerprint must be order-sensitive")
    val again = df.select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    assert(fps.toSeq === again.toSeq)
  }

  test("fingerprint stays in [0, 2^31-1) — no overflow under ANSI mode") {
    val fps = Tables.documents(spark, sfDir)
      .select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("tokenizer trims and splits on whitespace runs") {
    val df = Seq("  a  b c ").toDF("text")
    assert(df.select(TextFunctions.tokens(col("text"))).as[Seq[String]].head()
      === Seq("a", "b", "c"))
  }

  test("quality score stays in [0,1]") {
    val qs = Tables.documents(spark, sfDir)
      .select(TextFunctions.qualityScore(col("text"))).as[Double].collect()
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId always returns a profiled language") {
    val langs = TextFunctions.langProfiles.map(_._1).toSet
    val preds = Tables.documents(spark, sfDir)
      .select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(preds.forall(langs.contains))
  }

  test("BpeTokenCount equals an independent greedy longest-match reference") {
    import graft.queries.TextQueries.BpeVocab
    // reference: per word, maximal munch with single-char UNK fallback
    def refCount(word: String): Long = {
      val maxLen = BpeVocab.map(_.length).max
      val set = BpeVocab.toSet
      var pos = 0
      var n = 0L
      while (pos < word.length) {
        val k = (math.min(maxLen, word.length - pos) to 1 by -1)
          .find(l => set.contains(word.substring(pos, pos + l)))
          .getOrElse(1)
        n += 1
        pos += k
      }
      n
    }
    // hand cases pin the greedy law itself
    assert(refCount("") === 0L)
    assert(refCount("the") === 1L)     // longest match beats "th"
    assert(refCount("theory") === 3L)  // the|or|y
    assert(refCount("nation") === 3L)  // n|atio|n
    val docs = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val native = docs.select(col("doc_id"),
        graft.expressions.BpeTokenCount
          .bpeTokenCount(col("toks"), BpeVocab).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = docs.as[(Long, Seq[String])].collect()
      .map { case (id, toks) => id -> toks.map(refCount).sum }.toMap
    assert(native.keySet === expected.keySet)
    expected.foreach { case (id, n) => assert(native(id) === n, s"doc $id") }
  }

  test("q224: lexical-diversity invariants and a driver-side recount of one source") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q224_lexical_diversity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, v, h) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_vocab"),
        r.getAs[Long]("n_hapax"))
      assert(h <= v && v <= t)
      assert(r.getAs[Long]("ttr_ppm") === BigInt(v) * 1000000 / t)
      assert(r.getAs[Long]("hapax_ppm") === BigInt(h) * 1000000 / v)
    }
    val src0 = rows.head.getAs[String]("source")
    val words = Tables.documents(spark, sfDir)
      .filter(col("source") === src0)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .collect().map(_.getString(0))
    val counts = words.groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.head.getAs[Long]("n_tokens") === words.length.toLong)
    assert(rows.head.getAs[Long]("n_vocab") === counts.size.toLong)
    assert(rows.head.getAs[Long]("n_hapax") ===
      counts.values.count(_ == 1).toLong)
  }

  test("q239: TextRank output is descending, vocabulary-bounded, and " +
    "every rank respects the damping floor") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q239_textrank_keywords")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("word"), r.getAs[Long]("rank_scaled")))
    assert(rows.length === 20)
    val ranks = rows.map(_._2)
    assert(ranks === ranks.sorted.reverse)
    // (1 - d) floor: every node keeps at least 0.15 of the unit rank
    ranks.foreach(r => assert(r >= 150000000L))
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    rows.foreach { case (w, _) => assert(vocab(w), s"unknown keyword $w") }
  }

  test("q253: every source pair appears once, cos2 is in (0, 10^6], and " +
    "one pair recomputes exactly") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q253_source_similarity")(spark, sfDir)
      .collect()
      .map(r => ((r.getAs[String]("src_a"), r.getAs[String]("src_b")),
        (r.getAs[Long]("dot"), r.getAs[Long]("cos2_ppm"))))
      .toMap
    val sources = Tables.documents(spark, sfDir)
      .select("source").distinct().collect().map(_.getString(0)).sorted
    assert(rows.size === sources.length * (sources.length - 1) / 2)
    rows.foreach { case (p, (_, c)) =>
      assert(c >= 0L && c <= 1000000L, s"pair $p cos2 $c") }
    // exact recompute of the first pair
    val (sa, sb) = (sources(0), sources(1))
    def counts(s: String) = Tables.documents(spark, sfDir)
      .filter(col("source") === s)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(v => BigInt(v.size)).toMap
    val (ca, cb) = (counts(sa), counts(sb))
    val dot = ca.keysIterator.filter(cb.contains)
      .map(w => ca(w) * cb(w)).sum
    val (n2a, n2b) = (ca.values.map(c => c * c).sum, cb.values.map(c => c * c).sum)
    assert(rows((sa, sb))._1 === dot.toLong)
    assert(rows((sa, sb))._2 === (dot * dot * 1000000 / (n2a * n2b)).toLong)
  }

  test("q254: the bigram predictor's accuracy recomputes exactly and the " +
    "word-salad corpus stays far from deterministic") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q254_bigram_predictor")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // driver-side: train the same predictor, score one source
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), split(trim(col("text")), "\\s+").as("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val bigrams = toks.flatMap { case (_, t) => t.zip(t.drop(1)) }
    val pred = bigrams.groupBy(_._1).view.mapValues { bs =>
      bs.groupBy(_._2).view.mapValues(_.size).toSeq
        .maxBy { case (w2, c) => (c, w2) }._1
    }.toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val occ = toks.filter(_._1 == src).flatMap { case (_, t) => t.zip(t.drop(1)) }
      val correct = occ.count { case (w1, w2) => pred(w1) == w2 }
      assert(r.getAs[Long]("n_pairs") === occ.length.toLong, src)
      assert(r.getAs[Long]("n_correct") === correct.toLong, src)
      assert(r.getAs[Long]("acc_ppm") ===
        BigInt(correct) * 1000000 / occ.length)
      // a ~40-word uniform vocabulary caps top-1 bigram accuracy low
      assert(r.getAs[Long]("acc_ppm") < 500000L,
        s"$src implausibly predictable")
    }
  }

  test("q260: coverage is monotone in k, hits 10^6 when k exceeds the " +
    "vocabulary, and one cutoff recomputes exactly") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q260_vocab_coverage")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_words"),
        r.getAs[Long]("coverage_ppm"), r.getAs[Long]("n_vocab")))
      .sortBy(_._1)
    assert(rows.length === 5)
    val covs = rows.map(_._3)
    assert(covs === covs.sorted, "coverage must be monotone in k")
    rows.foreach { case (k, nw, _, nv) => assert(nw === math.min(k, nv)) }
    val full = rows.find(r => r._1 >= r._4).get
    assert(full._3 === 1000000L, "k >= |vocab| must cover everything")
    // recompute k=10 exactly
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    val total = counts.map(_._2).sum
    val mass10 = counts.take(10).map(_._2).sum
    assert(rows.head._3 === BigInt(mass10) * 1000000 / total)
  }

  test("q275: per-lang fertility agrees with q137's per-doc sums and " +
    "respects the >= 1 piece-per-word floor") {
    import graft.queries.TextQueries
    val langRows = TextQueries.q275LangFertility(spark, sfDir).collect()
    assert(langRows.nonEmpty)
    // cross-check: q137's per-doc (words, subwords) joined to lang must
    // sum to exactly the q275 rollup
    val perDoc = TextQueries.q137BpeTokens(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_subwords").as("s"),
        count(lit(1)).as("d"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    langRows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (w, s, d) = perDoc(lang)
      assert(r.getAs[Long]("n_words") === w, lang)
      assert(r.getAs[Long]("n_subwords") === s, lang)
      assert(r.getAs[Long]("n_docs") === d, lang)
      val f = r.getAs[Long]("fertility_ppm")
      assert(f === BigInt(s) * 1000000 / w, lang)
      // greedy BPE emits at least one piece per word, so fertility >= 1.0
      assert(f >= 1000000L, s"$lang fertility below 1 piece/word: $f")
    }
  }

  test("q291: the Zipf slope is negative, and the quantized OLS replays " +
    "driver-side") {
    import graft.queries.TextQueries
    val row = TextQueries.q291ZipfSlope(spark, sfDir).collect().head
    val slope = row.getAs[Long]("zipf_slope_milli")
    assert(slope < 0, s"rank-frequency slope must fall: $slope")
    // replay: same top-1024, same log2 quantization, BigInt OLS
    val counts = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.take(1024)
    def fl2(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (fl2(i + 1L), fl2(c)) }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    assert(row.getAs[Long]("n_terms") === pts.length.toLong)
    assert(BigInt(slope) === (n * sxy - sx * sy) * 1000 / (n * sxx - sx * sx))
  }

  test("q293: burstiness recounts driver-side and separates bursty terms " +
    "from uniform ones") {
    import graft.queries.TextQueries
    val rows = TextQueries.q293TermBurstiness(spark, sfDir).collect()
    assert(rows.length === 20)
    val nDocs = Tables.documents(spark, sfDir).count()
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t", "doc_id").count().as[(String, Long, Long)].collect()
      .groupBy(_._1)
    rows.foreach { r =>
      val term = r.getAs[String]("term")
      val xs = tf(term).map(_._3)
      assert(r.getAs[Long]("df") === xs.length.toLong, term)
      assert(r.getAs[Long]("df") <= nDocs, term)
      val sx = BigInt(xs.sum); val sx2 = xs.map(x => BigInt(x) * x).sum
      val expected = (BigInt(nDocs) * sx2 - sx * sx) * 1000 /
        (sx * (BigInt(nDocs) - 1))
      assert(BigInt(r.getAs[Long]("fano_milli")) === expected, term)
      assert(r.getAs[Long]("fano_milli") >= 0, term)
    }
    // the top-20 must show REAL spread — if every term sits at the same
    // Fano the metric discriminates nothing on this corpus
    val fanos = rows.map(_.getAs[Long]("fano_milli"))
    assert(fanos.max > fanos.min, "no burstiness spread in top-20 terms")
  }

  test("q311: Heaps growth conservation — curves are non-decreasing, the " +
    "final checkpoint carries the exact corpus totals, and every type " +
    "is minted exactly once") {
    import graft.functions.TextFunctions
    val rows = SparkEntry.queries("q311_heaps_growth")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("docs_cum") < b.getAs[Long]("docs_cum") ||
          a.getAs[Long]("docs_cum") == b.getAs[Long]("docs_cum"))
        assert(a.getAs[Long]("vocab_cum") <= b.getAs[Long]("vocab_cum"))
        assert(a.getAs[Long]("toks_cum") <= b.getAs[Long]("toks_cum"))
      case _ => ()
    }
    val last = rows.last
    val docs = Tables.documents(spark, sfDir)
    assert(last.getAs[Long]("docs_cum") === docs.count())
    val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("t"))
    assert(last.getAs[Long]("toks_cum") === toks.count())
    // new_types partition the vocabulary: Σ new = final cumulative = |V|
    assert(rows.map(_.getAs[Long]("new_types")).sum ===
      last.getAs[Long]("vocab_cum"))
    assert(last.getAs[Long]("vocab_cum") === toks.distinct().count())
    rows.foreach { r =>
      assert(r.getAs[Long]("ttr_ppm") ===
        r.getAs[Long]("vocab_cum") * 1000000L / r.getAs[Long]("toks_cum"))
    }
  }

  test("q334: phrases meet the support floor, occurrences bound docs, and " +
    "the top phrase replays driver-side") {
    val rows = SparkEntry.queries("q334_boilerplate_phrases")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 3)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
    }
    // replay the top phrase's counts from raw tokens
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
    val top = rows.head
    val phrase = top.getString(0)
    val hits = docs.map { case (id, t) =>
      id -> t.sliding(3).count(_.mkString(" ") == phrase)
    }.filter(_._2 > 0)
    assert(top.getAs[Long]("n_occurrences") === hits.map(_._2).sum.toLong)
    assert(top.getAs[Long]("n_docs") === hits.length.toLong)
    // nothing with more doc support was skipped
    val allTri = docs.flatMap { case (id, t) =>
      if (t.length >= 3) t.sliding(3).map(g => (g.mkString(" "), id)).toSeq
      else Nil }
    val bestSupport = allTri.distinct.groupBy(_._1).values.map(_.size).max
    assert(top.getAs[Long]("n_docs") === bestSupport.toLong)
  }

  test("q335: chunk lengths conserve the token count and shares are a " +
    "valid ppm partition") {
    val rows = SparkEntry.queries("q335_cdc_chunking")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalChunks = rows.map(_.getAs[Long]("n_chunks")).sum
    val totalTokens = rows
      .map(r => r.getAs[Long]("chunk_len") * r.getAs[Long]("n_chunks")).sum
    val expectTokens = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isNotNull)
      .select(size(graft.functions.TextFunctions.tokens(col("text"))))
      .collect().map(_.getInt(0).toLong).sum
    assert(totalTokens === expectTokens)
    rows.foreach { r =>
      assert(r.getAs[Long]("share_ppm") ===
        BigInt(r.getAs[Long]("n_chunks")) * 1000000 / totalChunks) }
  }

  test("q358: readability counts and both milli scores replay driver-side " +
    "from raw regex counts per source") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = SparkEntry.queries("q358_readability")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src).map(_._2)
      val w = mine.map(_.trim.split("\\s+").length.toLong).sum
      val sCount = mine.map("[.!?]+".r.findAllIn(_).length.toLong).sum
      val y = mine.map("[aeiouyAEIOUY]+".r.findAllIn(_).length.toLong).sum
      assert(r.getAs[Long]("n_docs") === mine.length.toLong)
      assert(r.getAs[Long]("n_words") === w, s"words $src")
      assert(r.getAs[Long]("n_sentences") === sCount, s"sentences $src")
      assert(r.getAs[Long]("n_syllables") === y, s"syllables $src")
      val ss = math.max(1L, sCount); val sw = math.max(1L, w)
      assert(r.getAs[Long]("flesch_milli") ===
        206835L - 1015L * w / ss - 84600L * y / sw, s"flesch $src")
      assert(r.getAs[Long]("fk_grade_milli") ===
        390L * w / ss + 11800L * y / sw - 15590L, s"fk $src")
    }
  }
}
