package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation invariants beyond the oracle hash-match: the planted
  * PII is actually found and scrubbed, the repetition rule keeps normal
  * documents, and the stratified sample hits its per-language rates.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("chunking law: chunk count and lengths derive exactly from n_chars") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val chunks = SparkEntry.queries("q101_doc_chunking")(spark, sfDir)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_len")
      .as[(Long, Int, Int, Int)].collect().groupBy(_._1)
    chunks.foreach { case (id, cs) =>
      val n = docs(id)
      // ceil(n / stride) chunks, ids dense from 0, each 120 chars except a
      // shorter tail, starts on the 90-char stride grid
      assert(cs.length === ((n - 1) / 90 + 1).toInt, s"doc $id")
      assert(cs.map(_._2).sorted.toSeq === (0 until cs.length))
      cs.foreach { case (_, cid, start, len) =>
        assert(start === cid * 90)
        assert(len === math.min(120L, n - start).toInt, s"doc $id chunk $cid")
      }
    }
    assert(chunks.keySet === docs.keySet.filter(docs(_) > 0))
  }

  test("bpeMerge follows the leftmost-greedy single-pass rule") {
    import graft.queries.CurationQueries.bpeMerge
    assert(bpeMerge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(bpeMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(bpeMerge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(bpeMerge(Seq("x"), "a", "b") === Seq("x"))
    assert(bpeMerge(Seq("b", "a", "a", "a"), "a", "a") === Seq("b", "aa", "a"))
    // a pre-merged symbol equal to l+r never re-merges with a lone r
    assert(bpeMerge(Seq("ab", "b"), "a", "b") === Seq("ab", "b"))
  }

  test("q133 construction launches no Spark job (budget decision is lazy)") {
    // the r7 shape ran evDocs.count() inside query construction — an
    // extra corpus-sized action per invocation. The decision now reads
    // parquet file statistics on the driver; building the DataFrame must
    // be job-free. Listener events are async, so first prove the listener
    // sees jobs at all (positive control), then assert none arrive.
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(5).count() // positive control
      // warm the one legitimate job: Tables' once-per-JVM parquet
      // schema-inference for the documents table
      Tables.documents(spark, sfDir)
      val deadline = System.currentTimeMillis() + 10000
      while (jobs == 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(jobs > 0, "listener must observe the control job")
      // let any in-flight async job-start events drain before snapshotting
      var before = -1
      while (jobs != before) { before = jobs; Thread.sleep(700) }
      SparkEntry.queries("q133_contamination")(spark, sfDir) // build only
      Thread.sleep(1500) // grace for any async job-start event
      assert(jobs === before,
        s"q133 construction launched ${jobs - before} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q133 falls back to a shuffled join past the broadcast budget, same results") {
    val broad = SparkEntry.queries("q133_contamination")(spark, sfDir)
    val broadRows = broad.collect().toSeq
    assert(broad.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // past the budget the hint is dropped — the decision returns to the
    // cost-based planner. At gate scale its size estimate still broadcasts
    // (correctly), so emulate the at-scale estimate by disabling
    // auto-broadcast: the static plan must become a shuffle join.
    spark.conf.set("spark.graft.contamination.broadcastDocLimit", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = SparkEntry.queries("q133_contamination")(spark, sfDir)
      val shuffledRows = shuffled.collect().toSeq
      // the STATIC decision is what the limit controls: the initial plan
      // must join without the broadcast hint (AQE may still localize the
      // tiny gate input at runtime — that is its job, not the hint's)
      val p = shuffled.queryExecution.executedPlan.toString
      val cut = p.indexOf("== Initial Plan ==")
      val initial = if (cut >= 0) p.substring(cut) else p
      assert("SortMergeJoin|ShuffledHashJoin".r.findFirstIn(initial).isDefined,
        s"initial plan must be a shuffle join:\n${initial.take(4000)}")
      assert(shuffledRows === broadRows, "fallback join must be result-identical")
    } finally {
      spark.conf.unset("spark.graft.contamination.broadcastDocLimit")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q136 classifier scoring is projection-only: no join, no aggregate, no hash exchange") {
    // the whole point of the native expression: model inference rides the
    // scan as a map-only stage — the sole exchange is the output ORDER BY
    val df = SparkEntry.queries("q136_quality_classifier")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("HashAggregate"), plan.take(3000))
    assert(!plan.toLowerCase.contains("hashpartitioning"), plan.take(3000))
    assert(!plan.contains("Generate"), plan.take(3000)) // no explode either
  }

  test("q135's per-(doc,bigram) pre-agg exchange is reused by both consumers at runtime") {
    // the count table aggregates the SAME pre-agg frame the probe side
    // joins — the executed adaptive plan must materialize that exchange
    // once (ReusedExchange), or the corpus explode+shuffle would run twice
    val df = SparkEntry.queries("q135_doc_fluency")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    assert(finalPlan.contains("ReusedExchange"),
      s"q135 executed plan must reuse the pre-agg exchange:\n${finalPlan.take(6000)}")
  }

  test("q164 excises exactly the ±2-token windows around eval-gram hits (reference replay)") {
    // independent in-memory implementation of the whole rule, compared
    // md5-for-md5 — and the contaminated-doc set must equal q133's
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    def grams(ts: Seq[String]): Seq[String] =
      if (ts.length < 3) Seq(ts.mkString(" "))
      else ts.sliding(3).map(_.mkString(" ")).toSeq
    val ev = docs.filter(_._1 % 97 == 0).flatMap(d => grams(toks(d._1))).toSet
    val expect = docs.filter(_._1 % 97 != 0).flatMap { case (id, _) =>
      val ts = toks(id)
      val hitPos = grams(ts).zipWithIndex.collect { case (g, i) if ev(g) => i }
      if (hitPos.isEmpty) None
      else {
        val covered = hitPos.flatMap(p => math.max(p - 2, 0) to p + 4).toSet
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        Some((id, (ts.indices.count(covered).toLong,
          md5hex(kept.mkString(" ")))))
      }
    }.toMap
    val got = SparkEntry.queries("q164_span_decontaminate")(spark, sfDir)
      .as[(Long, Long, String)].collect()
      .map { case (id, n, m) => id -> (n, m) }.toMap
    assert(got === expect)
    val q133Docs = SparkEntry.queries("q133_contamination")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(got.keySet === q133Docs,
      "decontamination must touch exactly the docs q133 detects")
  }

  test("q163 redacts exactly the Luhn-valid planted cards, leaves invalid ones") {
    val rows = SparkEntry.queries("q163_creditcard_redact")(spark, sfDir)
      .select("doc_id", "n_cc").as[(Long, Long)].collect()
    rows.foreach { case (id, n) =>
      assert(n === (if (id % 13 == 0) 1L else 0L), s"doc $id")
    }
  }

  test("q160 trained weights drop into LinearTextScore: expression ≡ declarative scoring") {
    // the training hash IS the scorer's hash (first 4 md5 bytes mod 64),
    // so the learned vector is directly consumable by q136's codegen'd
    // expression — score every doc both ways and compare exactly
    val w = SparkEntry.queries("q160_classifier_training")(spark, sfDir)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(w.length === 64)
    assert(w.map(_._1).toSeq === (0L until 64L))
    assert(w.exists(_._2 != 0L), "training must move some weight")
    val weights = w.map(_._2.toInt).toSeq // |w| << Int.MaxValue at this sf
    val viaExpr = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.expressions.LinearTextScore
        .linearTextScore(graft.functions.TextFunctions.tokens(col("text")),
          weights, maxNgram = 1).as("s"))
      .as[(Long, Long)].collect().toMap
    val wdf = weights.zipWithIndex.map { case (wt, b) => (b.toLong, wt.toLong) }
      .toDF("b", "wt")
    val viaJoin = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("f"))
      .select(col("doc_id"),
        (conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long") % 64).as("b"))
      .join(wdf, "b")
      .groupBy("doc_id").agg(sum("wt").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr === viaJoin)
    // and the learned model carries signal: English docs should score
    // higher on average than non-English (the training label)
    val langs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val (en, other) = viaExpr.toSeq.partition { case (id, _) => langs(id) == "en" }
    assert(en.map(_._2.toDouble).sum / en.size >
      other.map(_._2.toDouble).sum / other.size,
      "trained scores must separate the training classes on average")
  }

  test("q160 gradient steps reuse the feature-frame exchange at runtime") {
    // the (doc, y, bucket) count is the ONE corpus-sized frame; all three
    // unrolled steps re-aggregate it, so the executed adaptive plan must
    // materialize its exchange once and ReusedExchange the rest
    val df = SparkEntry.queries("q160_classifier_training")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    assert(finalPlan.contains("ReusedExchange"),
      s"q160 executed plan must reuse the feature exchange:\n${finalPlan.take(6000)}")
  }

  test("PII redaction finds exactly the planted emails and phones") {
    val rows = SparkEntry.queries("q79_pii_redact")(spark, sfDir)
      .select("doc_id", "n_pii").as[(Long, Int)].collect()
    rows.foreach { case (id, n) =>
      val expected = if (id % 10 == 0 || id % 10 == 5) 1 else 0
      assert(n === expected, s"doc $id")
    }
  }

  test("redaction leaves no match behind (scrub is complete)") {
    val redacted = graft.queries.CurationQueries
      .q79PiiRedact(spark, sfDir) // md5 output — recheck on the raw op
    // rebuild the redacted text directly to scan it for leftovers
    val leftover = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now")).as("text"))
      .filter(col("doc_id") % 10 === 0)
      .select(regexp_replace(col("text"),
        lit("[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")).as("r"))
      .filter(col("r").rlike("@"))
      .count()
    assert(leftover === 0, "an email survived redaction")
    assert(redacted.count() > 0)
  }

  test("repetition filter keeps a majority of the organic corpus") {
    val df = SparkEntry.queries("q78_quality_repetition")(spark, sfDir)
    val total = df.count()
    val kept = df.filter(col("keep")).count()
    // synthetic docs are non-repetitive; the rule must not mass-drop them
    // (only short docs < 20 tokens should fall out)
    assert(kept.toDouble / total >= 0.5, s"kept $kept of $total")
    // and the signals stay in-range
    val bad = df.filter(col("dup_trigram_ratio") < 0 || col("dup_trigram_ratio") > 1 ||
      col("top_token_share") <= 0 || col("top_token_share") > 1).count()
    assert(bad === 0)
  }

  test("int8 quantization bounds the reconstruction error by half a step") {
    val v = graft.functions.Similarity.toDouble(col("embedding"))
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / maxAbs
    val quant = transform(v, x => floor(x * scale + lit(0.5)).cast("int"))
    val worst = Tables.embeddings(spark, sfDir)
      .select(
        array_max(zip_with(v, quant,
          (x, q) => abs(x - q.cast("double") / scale))).as("err"),
        (lit(0.5) / scale).as("half_step"))
      .filter(col("err") > col("half_step") * 1.000001) // fp slack
      .count()
    assert(worst === 0, "a quantized value strayed past half a step")
  }

  test("q188: subword grams catch the hyphen-joined plants that word grams miss") {
    val rows = SparkEntry.queries("q188_subword_decontaminate")(spark, sfDir)
      .select("doc_id", "n_shared_subword_grams", "word_gram_hit")
      .as[(Long, Long, Int)].collect()
    val plants = rows.filter(_._1 >= graft.queries.SimilarityQueries.PlantOffset)
    assert(plants.nonEmpty, "the corpus must yield at least one plant")
    plants.foreach { case (id, nShared, wordHit) =>
      // hyphen-joining makes every whitespace token unique → word grams miss
      assert(wordHit === 0, s"plant $id must NOT be caught by word trigrams")
      // but the munch never crosses a hyphen, so the pieces of 'customer'
      // (c u st o me r — one full 6-gram) collide with the original eval doc
      assert(nShared >= 1, s"plant $id must be caught by subword grams")
    }
    // the segment expression is the count expression's expansion
    val mism = Tables.documents(spark, sfDir)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(
        size(graft.expressions.BpeSegment
          .bpeSegment(col("toks"), graft.queries.TextQueries.BpeVocab)).cast("long").as("n_seg"),
        graft.expressions.BpeTokenCount
          .bpeTokenCount(col("toks"), graft.queries.TextQueries.BpeVocab).as("n_cnt"))
      .filter(col("n_seg") =!= col("n_cnt")).count()
    assert(mism === 0, "size(bpeSegment) must equal bpeTokenCount on every doc")
  }

  test("q188 at trained-vocab scale: ~1k-piece q152-rule vocab still catches " +
    "hyphen-joined plants; Spark munch matches the driver replay") {
    // The testdata corpus has 31 distinct words (max 8 chars) — any
    // seriously trained vocab saturates it (every word → 1 piece, no
    // within-word 6-gram survives), so the realistic-vocab proof brings a
    // RICHER synthetic corpus through the SAME plan (subwordDecontaminateCore).
    val rnd = new scala.util.Random(7)
    // Zipf-ish word distribution: 40 frequent short words + 400 rare
    // suffix-sharing words (the mid-tail a trainer partially compresses)
    // + ONE 20-char random singleton per doc (the true tail realistic
    // vocabs keep fragmenting — its pairs are freq-1, so a 1k-merge
    // budget barely touches it and greedy munch leaves >= 6 pieces)
    val freq = (0 until 40).map(i => s"w${i}common")
    val rare = (0 until 400).map(i => s"xq${i}rarevocabword${i % 7}")
    def sentence(): String = {
      val n = 30 + rnd.nextInt(40)
      val ws = (0 until n).map { _ =>
        if (rnd.nextInt(10) < 7) freq(rnd.nextInt(freq.length))
        else rare(rnd.nextInt(rare.length))
      }
      val singleton = (0 until 20).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      // every doc carries the plant hook token and its own tail word
      (ws :+ singleton :+ "customer").mkString(" ")
    }
    val docs = (0L until 300L).map(i => (i, sentence())).toDF("doc_id", "text")
    // q152's merge rule iterated to ~1k pieces, driver-side over the word
    // vocabulary (Zipf-small — the trainer's actual input relation)
    val wordCounts = scala.collection.mutable.HashMap.empty[String, Long]
    docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect()
      .foreach { case (w, n) => wordCounts(w) = n }
    var syms: Seq[(Seq[String], Long)] =
      wordCounts.toSeq.map { case (w, n) => (w.map(_.toString), n) }
    val pieces = scala.collection.mutable.LinkedHashSet.empty[String]
    var stop = false
    while (pieces.size < 1000 && !stop) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (ss, n) =>
        var j = 0
        while (j < ss.length - 1) {
          pairCounts(ss(j) -> ss(j + 1)) =
            pairCounts.getOrElse(ss(j) -> ss(j + 1), 0L) + n
          j += 1
        }
      }
      if (pairCounts.isEmpty) stop = true
      else {
        // q152's tie rule: max count, then lexicographically smallest pair
        val best = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        pieces += (best._1 + best._2)
        syms = syms.map { case (ss, n) =>
          (graft.queries.CurationQueries.bpeMerge(ss, best._1, best._2), n)
        }
      }
    }
    val trained = pieces.toSeq
    assert(trained.size >= 900, s"trainer saturated early at ${trained.size}")
    // driver-side greedy reference (the replay): same maximal munch law
    val maxLen = trained.map(_.length).max
    val vset = trained.toSet
    def seg(word: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < word.length) {
        // longest vocab piece, or one char as UNK (l == 1 always accepts)
        val k = (math.min(maxLen, word.length - pos) to 1 by -1)
          .find(l => l == 1 || vset.contains(word.substring(pos, pos + l)))
          .get
        out += word.substring(pos, pos + k)
        pos += k
      }
      out.toSeq
    }
    // expected catches: a plant is provably caught iff its source doc has
    // a word whose piece run is >= 6 (one full shingle window inside the
    // word — hyphens never split it because no trained piece contains '-')
    assert(!trained.exists(_.contains("-")))
    val texts = docs.as[(Long, String)].collect().toMap
    val evalIds = texts.keys.filter(id => id % 97 == 0 &&
      texts(id).split("\\s+").contains("customer"))
    val expectCaught = evalIds.filter(id =>
      texts(id).split("\\s+").exists(w => seg(w).length >= 6))
      .map(_ + graft.queries.SimilarityQueries.PlantOffset).toSet
    assert(expectCaught.nonEmpty,
      "synthetic corpus must leave some words fragmenting to >= 6 pieces")
    val rows = graft.queries.CurationQueries
      .subwordDecontaminateCore(spark, docs, trained)
      .select("doc_id", "n_shared_subword_grams", "word_gram_hit")
      .as[(Long, Long, Int)].collect()
    val caught = rows.filter(_._1 >= graft.queries.SimilarityQueries.PlantOffset)
      .map(r => r._1 -> r).toMap
    expectCaught.foreach { id =>
      assert(caught.contains(id) && caught(id)._2 >= 1,
        s"plant $id must be caught at trained-vocab scale")
      // hyphen-joining still defeats word trigrams
      assert(caught(id)._3 === 0, s"plant $id must NOT hit word grams")
    }
    // the replay check: Spark's codegen'd munch == the driver reference
    // on every distinct corpus word, at the big vocab's maxLen
    val sparkSeg = docs.limit(50)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
      .select(col("w"), graft.expressions.BpeSegment
        .bpeSegment(array(col("w")), trained).as("ps"))
      .as[(String, Seq[String])].collect()
    assert(sparkSeg.nonEmpty)
    sparkSeg.foreach { case (w, ps) =>
      assert(ps === seg(w), s"munch divergence on '$w'")
    }
  }

  test("q193: incremental curation reads the persisted domain index and " +
    "the kill path actually fires") {
    val out = SparkEntry.queries("q193_incremental_domain_curation")(spark, sfDir)
    // the merged plan must READ yesterday's persisted index, not re-derive
    // it from yesterday's documents
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_domain_stats_idx"),
      s"q193 must scan the persisted domain-stats index:\n${plan.take(2000)}")
    // the self-calibrating kill rule removes at least one domain vs the
    // kill-free q191 surface (blocklist is shared by both)
    val q193Domains = out.select("domain").as[String].collect().toSet
    val q191Domains = SparkEntry.queries("q191_domain_curation")(spark, sfDir)
      .select("domain").as[String].collect().toSet
    assert(q193Domains.subsetOf(q191Domains))
    assert(q193Domains.size < q191Domains.size,
      "below-corpus-rate domains must be killed (kill path fired)")
  }

  test("stratified sample rates land near the configured per-lang fractions") {
    val sampled = SparkEntry.queries("q80_stratified_sample")(spark, sfDir)
      .select("lang", "n_sampled").as[(String, Long)].collect().toMap
    val totals = Tables.documents(spark, sfDir).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val expect = Map("en" -> 64.0 / 256, "de" -> 128.0 / 256, "fr" -> 192.0 / 256)
    expect.foreach { case (lang, rate) =>
      if (totals.contains(lang)) {
        val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
        // md5 buckets are uniform; at corpus sizes a ±15pp band is far
        // beyond any plausible binomial deviation
        assert(math.abs(got - rate) <= 0.15, s"$lang: rate $got vs $rate")
      }
    }
    // non-configured languages are kept whole
    (totals.keySet -- expect.keySet -- Set()).foreach { lang =>
      assert(sampled.getOrElse(lang, 0L) === totals(lang), s"$lang must keep all")
    }
  }

  test("q212: a driver-side HTML render + jusText-rule extractor reproduces " +
    "every doc's block counts and extracted-text md5; nav and footer " +
    "boilerplate never survive") {
    val out = SparkEntry.queries("q212_html_extract")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_kept_blocks"),
          r.getAs[Long]("n_words_kept"), r.getAs[String]("extracted_md5"))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.length === out.size)
    val nav = "<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">" +
      "About</a> <a href=\"/contact\">Contact</a></div>"
    val foot = "<div id=\"foot\">(c) 2026 <a href=\"/terms\">Terms</a> " +
      "<a href=\"/privacy\">Privacy</a></div>"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val chunks = toks.grouped(12).toArray
      val blocks = nav +: chunks.zipWithIndex.map { case (c, i) =>
        "<p>" + c.mkString(" ") +
          (if (i % 3 == 0) " <a href=\"/more\">read more</a>" else "") + "</p>"
      } :+ foot
      // independent extractor: tag-strip, anchor-capture, keep rule
      val kept = blocks.flatMap { b =>
        val vis = b.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
        val linkChars = "<a [^>]*>([^<]*)</a>".r.findAllMatchIn(b)
          .map(_.group(1).length).sum
        val nw = if (vis.isEmpty) 0 else vis.split(" ").length
        val lppm = linkChars.toLong * 1000000 / math.max(vis.length, 1)
        if (nw >= 5 && lppm <= 340000) Some((vis, nw.toLong)) else None
      }
      val (nb, nk, nw, md) = out(id)
      assert(nb === blocks.length.toLong, s"doc $id block count")
      assert(nk === kept.length.toLong, s"doc $id kept count")
      assert(nw === kept.map(_._2).sum, s"doc $id kept words")
      assert(md === md5hex(kept.map(_._1).mkString(" ")), s"doc $id md5")
      // boilerplate never survives: the nav/footer blocks' visible text
      // is never among the kept blocks
      kept.foreach { case (vis, _) =>
        assert(vis != "Home About Contact" && vis != "(c) 2026 Terms Privacy",
          s"doc $id kept a boilerplate block: $vis")
      }
    }
  }

  test("q218: per-language thirds are equal-depth (±1) and score-ordered " +
    "head >= middle >= tail") {
    val rows = SparkEntry.queries("q218_lang_quality_buckets")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("tier"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("best_score"),
        r.getAs[Long]("worst_score")))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, tiers) =>
      assert(tiers.map(_._2).toSet == Set("head", "middle", "tail"),
        s"$lang missing a tier")
      val depths = tiers.map(_._3)
      assert(depths.max - depths.min <= 1, s"$lang tiers unbalanced: $depths")
      val t = tiers.map(x => x._2 -> x).toMap
      // descending rank order: the worst doc of a higher tier is at least
      // as good as the best doc of the next tier
      assert(t("head")._5 >= t("middle")._4, s"$lang head/middle overlap wrong")
      assert(t("middle")._5 >= t("tail")._4, s"$lang middle/tail overlap wrong")
    }
    // buckets partition the corpus exactly
    val total = rows.map(_._3).sum
    assert(total === Tables.documents(spark, sfDir).count())
  }

  test("q225: every planted doc violates the plant-marker rule, and flagged " +
    "rule lists are sorted and deduplicated") {
    val rows = SparkEntry.queries("q225_policy_regex_filter")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("rules"),
        r.getAs[Long]("n_rules")))
    val offset = graft.queries.SimilarityQueries.PlantOffset
    val nPlants = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).count()
    val plantRows = rows.filter(_._1 >= offset)
    assert(plantRows.length.toLong === nPlants,
      "every plant carries the zz9end marker and must be flagged")
    plantRows.foreach { case (id, rules, _) =>
      assert(rules.split(",").contains("r1_plant_marker"), s"doc $id: $rules") }
    rows.foreach { case (id, rules, n) =>
      val rs = rules.split(",").toSeq
      assert(rs === rs.sorted && rs.distinct === rs, s"doc $id rules not canonical")
      assert(rs.length.toLong === n)
    }
    // no unplanted doc matches the plant marker
    assert(rows.filter(_._1 < offset)
      .forall(!_._2.split(",").contains("r1_plant_marker")))
  }

  test("q233: Hamilton apportionment — seats sum to the budget exactly, " +
    "each source gets floor or floor+1, extras go to the largest remainders") {
    val rows = SparkEntry.queries("q233_apportionment")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("base"), r.getAs[Long]("rem"), r.getAs[Long]("extra"),
        r.getAs[Long]("seats")))
    assert(rows.map(_._6).sum === 1000L)
    rows.foreach { case (_, _, base, _, extra, seats) =>
      assert(extra === 0L || extra === 1L)
      assert(seats === base + extra)
    }
    // the awarded extras are exactly the top-(K - sum(base)) remainders
    val nExtras = 1000L - rows.map(_._3).sum
    val awarded = rows.filter(_._5 == 1L).map(r => (r._4, r._1)).toSet
    val topByRem = rows.sortBy(r => (-r._4, r._1)).take(nExtras.toInt)
      .map(r => (r._4, r._1)).toSet
    assert(awarded === topByRem)
    // exact-proportionality sanity: |seats - 1000*n/N| < 1
    val n = rows.map(_._2).sum
    rows.foreach { case (s, nd, _, _, _, seats) =>
      val quota = BigDecimal(1000L) * nd / n
      assert((BigDecimal(seats) - quota).abs < 1, s"$s seats $seats vs quota $quota")
    }
  }

  test("q265: one mask per chunk, ~10% of tokens masked on chunk-aligned " +
    "docs, and the manifest md5 is stable across executions") {
    val a = SparkEntry.queries("q265_span_corruption")(spark, sfDir).collect()
    val b = SparkEntry.queries("q265_span_corruption")(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "the schedule must be deterministic across executions")
    a.foreach { r =>
      val (nt, nc, nm) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_masked"))
      assert(nc === math.max(1L, nt / 10))
      assert(nm >= 1L && nm <= nc, "distinct mask positions within chunks")
      val ppm = r.getAs[Long]("masked_ppm")
      assert(ppm === nm * 1000000L / nt)
      // one mask per 10-token chunk; unmasked tail tokens dilute the
      // share below 10%, never past the 19-token worst case (~5.26%)
      if (nt >= 10)
        assert(ppm >= 52631L && ppm <= 100000L,
          s"doc ${r.getAs[Long]("doc_id")}: masked $ppm ppm")
      assert(r.getAs[String]("mask_md5").length === 32)
    }
  }

  test("q274: every source keeps >= 80% of its mass, and the kept prefix " +
    "is MINIMAL (dropping its smallest kept doc falls below the line)") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.q274TopPCuration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("nw"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val kept = r.getAs[Long]("mass_kept")
      val total = r.getAs[Long]("mass_total")
      val nKept = r.getAs[Long]("n_kept")
      assert(kept * 100 >= total * 80, s"$src keeps under 80%")
      // minimality: ranked desc, the kept prefix is exactly n_kept docs
      // and the prefix ONE SHORTER is below 80%
      val sorted = docs(src).sortBy(d => (-d._3, d._2)).map(_._3)
      val prefix = sorted.take(nKept.toInt)
      assert(prefix.sum === kept, src)
      assert(prefix.dropRight(1).sum * 100 < total * 80,
        s"$src kept a non-minimal prefix")
      assert(r.getAs[Long]("kept_share_ppm") ===
        BigInt(kept) * 1000000 / total, src)
    }
    // discriminating corpus: somewhere the cut actually drops docs
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")),
      "top-p cut nothing anywhere - vacuous corpus")
  }

  test("q276: holdout membership is a pure function of doc identity " +
    "(driver-side md5 replay), manifests are deterministic, rates sane") {
    import graft.queries.CurationQueries
    val r1 = CurationQueries.q276HoldoutSample(spark, sfDir).collect()
    val r2 = CurationQueries.q276HoldoutSample(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq,
      "sampler is not deterministic across runs")
    // driver-side replay of the bucket rule
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = h.take(2).map("%02x".format(_)).mkString // first 4 hex chars
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val docs = Tables.documents(spark, sfDir).select("source", "doc_id")
      .as[(String, Long)].collect().groupBy(_._1)
    r1.foreach { r =>
      val src = r.getAs[String]("source")
      val ids = docs(src).map(_._2)
      val sampled = ids.filter(bucket(_) == 0L).sorted
      assert(r.getAs[Long]("n_docs") === ids.length, src)
      assert(r.getAs[Long]("n_sampled") === sampled.length, src)
      val manifest = java.security.MessageDigest.getInstance("MD5")
        .digest(sampled.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("sample_md5") === manifest, src)
      // the reported rate is exactly the integer law (small per-source
      // doc counts make distributional bounds meaningless here — a
      // 25-doc source legitimately draws an empty 1/16 bucket)
      assert(r.getAs[Long]("rate_ppm") ===
        r.getAs[Long]("n_sampled") * 1000000L / r.getAs[Long]("n_docs"), src)
    }
    // corpus-wide the fixed dataset does yield a non-empty holdout
    assert(r1.map(_.getAs[Long]("n_sampled")).sum > 0,
      "corpus-wide holdout came out empty")
  }

  test("q284: token mass is conserved, kept counts agree with the dedup " +
    "map, and dedup actually removes something") {
    import graft.queries.{CurationQueries, GraphQueries}
    val rows = CurationQueries.q284EffectiveCorpus(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("raw_tokens"))
    }
    // conservation: per-source totals sum to the full planted corpus
    val map = GraphQueries.q269DedupMap(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === map.length)
    assert(rows.map(_.getAs[Long]("n_kept")).sum ===
      map.count(_.getAs[Boolean]("keep")))
    // plants guarantee a real dedup delta
    assert(rows.map(_.getAs[Long]("n_kept")).sum <
      rows.map(_.getAs[Long]("n_docs")).sum,
      "dedup removed nothing - plants missing?")
  }

  test("q282: blast-radius is the exact transpose of q133's evidence") {
    import graft.queries.CurationQueries
    val blast = CurationQueries.q282EvalBlastRadius(spark, sfDir).collect()
    val fwd = CurationQueries.q133ContaminationCheck(spark, sfDir).collect()
    assert(blast.nonEmpty && fwd.nonEmpty)
    blast.foreach { r =>
      assert(r.getAs[Long]("max_shared_ngrams") >= 1L)
      assert(r.getAs[Long]("n_shared_gram_pairs") >=
        r.getAs[Long]("n_train_docs"))
    }
    // transpose law: both sides describe the same (train, eval, gram)
    // evidence set, so total distinct shared grams must reconcile —
    // q133's n_shared_ngrams is per TRAIN doc across all eval docs
    // (distinct grams), which is <= the pair mass; and the flagged
    // TRAIN population must equal the union q282 sees
    val trainFlagged = fwd.map(_.getAs[Long]("doc_id")).toSet
    val pairMass = blast.map(_.getAs[Long]("n_shared_gram_pairs")).sum
    assert(fwd.map(_.getAs[Long]("n_shared_ngrams")).sum <= pairMass)
    assert(blast.map(_.getAs[Long]("n_train_docs")).sum >=
      trainFlagged.size)
  }

  test("q305: greedy coverage picks 4 distinct sources, marginal gains " +
    "are non-increasing, and step 1 is the true max-coverage source") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.q305GreedyCoverage(spark, sfDir)
      .orderBy(col("step")).collect()
    assert(rows.length === 4)
    val sources = rows.map(_.getAs[String]("source"))
    assert(sources.distinct.length === 4, "a source was picked twice")
    // submodularity: greedy marginal gains never increase
    val gains = rows.map(_.getAs[Long]("marginal_terms"))
    gains.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"marginal gain rose: $a -> $b")
      case _ =>
    }
    // cumulative bookkeeping + coverage bounds
    assert(rows.map(_.getAs[Long]("cumulative_terms")).toSeq ===
      gains.scanLeft(0L)(_ + _).tail.toSeq)
    val cov = rows.map(_.getAs[Long]("coverage_ppm"))
    cov.sliding(2).foreach {
      case Array(a, b) => assert(b >= a)
      case _ =>
    }
    assert(cov.last <= 1000000L && cov.head > 0L)
    // step 1 = argmax of per-source distinct-shingle coverage, recomputed
    val posting = graft.Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(graft.expressions.ShingleStrings.shingleStrings(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("t"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = posting.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val top = bySource.toSeq.map { case (s, ts) => (ts.size, s) }
      .sortBy { case (n, s) => (-n, s) }.head
    assert(rows.head.getAs[String]("source") === top._2)
    assert(gains.head === top._1.toLong)
  }

  test("q316: novelty partitions each source's shingles, corpus-unique " +
    "mass reconciles globally, and one source replays driver-side") {
    val rows = SparkEntry.queries("q316_source_novelty")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique") + r.getAs[Long]("n_shared") ===
        r.getAs[Long]("n_shingles"), s"partition broken: $r")
      assert(r.getAs[Long]("novelty_ppm") ===
        r.getAs[Long]("n_unique") * 1000000L / r.getAs[Long]("n_shingles"))
    }
    // global reconciliation from the raw posting
    import org.apache.spark.sql.functions._
    val posting = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(graft.expressions.ShingleStrings.shingleStrings(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("term"))
      .distinct().cache()
    try {
      val uniqueTotal = posting.groupBy(col("term"))
        .agg(count(lit(1)).as("df")).filter(col("df") === 1).count()
      assert(rows.map(_.getAs[Long]("n_unique")).sum === uniqueTotal)
      // one source end-to-end
      val src = rows.head.getAs[String]("source")
      val mine = posting.filter(col("source") === src)
        .select(col("term")).collect().map(_.getString(0)).toSet
      val others = posting.filter(col("source") =!= src)
        .select(col("term")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(rows.head.getAs[Long]("n_shingles") === mine.size.toLong)
      assert(rows.head.getAs[Long]("n_unique") ===
        (mine -- others).size.toLong)
    } finally posting.unpersist()
  }

  test("q320: Neyman weights are true integer sqrts of the variance " +
    "numerator, both allocations seat exactly 10000, and variance-heavy " +
    "strata gain seats over proportional") {
    val rows = SparkEntry.queries("q320_neyman_allocation")(spark, sfDir)
      .collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("alloc_neyman")).sum === 10000L)
    assert(rows.map(_.getAs[Long]("alloc_prop")).sum === 10000L)
    // replay every stratum's V_h and isqrt from raw cents
    val byPri = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("p"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) =>
        val cs = xs.map(x => BigInt(x._2))
        val v = cs.length * cs.map(x => x * x).sum - cs.sum * cs.sum
        (k, cs.length.toLong, cs.map(_.toLong).sum, v)
      }.toSeq.sortBy(_._1)
    rows.sortBy(_.getAs[String]("priority")).zip(byPri).foreach {
      case (r, (p, n, sc, v)) =>
        assert(r.getAs[String]("priority") === p)
        assert(r.getAs[Long]("n_h") === n)
        assert(r.getAs[Long]("sum_c") === sc)
        val w = BigInt(r.getAs[Long]("w_h"))
        assert(w * w <= v && (w + 1) * (w + 1) > v,
          s"w_h is not isqrt(V): w=$w V=$v")
    }
    // seats track weight shares within 1 (largest-remainder property)
    val tw = rows.map(_.getAs[Long]("w_h")).map(BigInt(_)).sum
    rows.foreach { r =>
      val exact = BigInt(r.getAs[Long]("w_h")) * 10000
      val lo = (exact / tw).toLong
      val got = r.getAs[Long]("alloc_neyman")
      assert(got === lo || got === lo + 1, s"seating outside floor/ceil: $r")
    }
  }

  test("q344: every table's erasure impact replays from the subject list") {
    val rows = SparkEntry.queries("q344_erasure_plan")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("customer", "orders", "lineitem", "events"))
    val subjects = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 97 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(rows("customer").getAs[Long]("n_rows") === subjects.size.toLong)
    assert(rows("customer").getAs[Long]("cents") === 0L)
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(o => subjects.contains(o._2))
    assert(rows("orders").getAs[Long]("n_rows") === ords.length.toLong)
    assert(rows("orders").getAs[Long]("cents") === ords.map(_._3).sum)
    assert(rows("orders").getAs[Long]("n_subjects") ===
      ords.map(_._2).distinct.length.toLong)
    val okeys = ords.map(_._1).toSet
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(l => okeys.contains(l._1))
    assert(rows("lineitem").getAs[Long]("n_rows") === li.length.toLong)
    assert(rows("lineitem").getAs[Long]("cents") === li.map(_._2).sum)
  }

  test("q345: the four diff classes replay from the residue rules and " +
    "partition old ∪ new") {
    val rows = SparkEntry.queries("q345_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val added = ids.count(_ % 17 == 3).toLong
    val removed = ids.count(_ % 29 == 7).toLong
    val changed = ids.count(d => d % 17 != 3 && d % 23 == 5).toLong
    val unchanged = ids.length - added - changed
    assert(rows.getOrElse("added", 0L) === added)
    assert(rows.getOrElse("removed", 0L) === removed)
    assert(rows.getOrElse("changed", 0L) === changed)
    assert(rows.getOrElse("unchanged", 0L) === unchanged)
  }

  test("q365: temperature weights are exact isqrts, the largest-remainder " +
    "allocation replays driver-side, and the budget is conserved EXACTLY") {
    def isqrt(v: BigInt): BigInt =
      if (v <= 0) BigInt(0) else {
        var r = BigInt(math.sqrt(v.toDouble).toLong)
        while (r * r > v) r -= 1
        while ((r + 1) * (r + 1) <= v) r += 1
        r
      }
    val rows = SparkEntry.queries("q365_temperature_mixture")(spark, sfDir)
      .collect()
    val budget = graft.queries.CurationQueries.MixtureTokenBudget
    assert(rows.map(_.getAs[Long]("tokens_alloc")).sum === budget,
      "largest-remainder must conserve the budget exactly")
    rows.foreach { r =>
      assert(BigInt(r.getAs[Long]("weight")) ===
        isqrt(BigInt(r.getAs[Long]("kept_subwords"))))
    }
    // replay the apportionment from the (source, weight) frame
    val ws = rows.map(r =>
      (r.getAs[String]("source"), BigInt(r.getAs[Long]("weight"))))
    val totW = ws.map(_._2).sum
    val base = ws.map { case (s, w) => (s, w * budget / totW,
      w * budget % totW) }
    val leftover = budget - base.map(_._2).sum.toLong
    val winners = base.sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val b = base.find(_._1 == s).get._2
      val expect = b + (if (winners.contains(s)) 1 else 0)
      assert(BigInt(r.getAs[Long]("tokens_alloc")) === expect, s"alloc $s")
    }
    // tau = 1/2 flattens: max/min allocation ratio must not exceed the
    // proportional plan's max/min kept-subword ratio
    val ks = rows.map(_.getAs[Long]("kept_subwords")).filter(_ > 0)
    val al = rows.map(_.getAs[Long]("tokens_alloc")).filter(_ > 0)
    assert(al.max.toDouble / al.min <= ks.max.toDouble / ks.min + 1e-9)
  }
}
