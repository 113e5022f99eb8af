package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RetrievalQueries

class RetrievalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q143: index totals reconcile with the raw token stream") {
    val idx = RetrievalQueries.q143InvertedIndex(spark, sfDir)
    val byIndex = idx.agg(sum("total_tf")).as[Long].head()
    val byScan = Tables.documents(spark, sfDir)
      .select(size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(byIndex === byScan, "sum of term frequencies must equal corpus token count")
    // df counts distinct docs, so df <= total_tf and df >= 1
    assert(idx.filter(col("df") < 1 || col("df") > col("total_tf")).count() === 0)
  }

  test("q154: pairing df cap bounds fan-out; scores stay exact over the full scoring set") {
    // six docs, three terms: "x" df=2, "y" df=3, "common" df=6.
    // stopword cut (df·2 ≤ 6) scores x and y, drops common.
    // With maxPairingDf=2 only x anchors pairs → exactly (1,2) surfaces;
    // y (df=3 > cap) generates NO pairs even though it is scored —
    // that is the bound: a term past the cap never self-joins.
    val dir = java.nio.file.Files.createTempDirectory("q154cap").toString
    Seq(
      (1L, "x common"), (2L, "x common"), (3L, "y common"),
      (4L, "y common"), (5L, "y common"), (6L, "common"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.simjoin.maxPairingDf", "2")
    try {
      val capped = RetrievalQueries.q154SparseSimJoin(spark, dir)
        .select("d1", "d2", "n_shared_terms", "score")
        .as[(Long, Long, Long, Long)].collect().toSet
      // idf(x) = (6-2)*1000 div 3 = 1333; score = 1·1·1333²
      assert(capped === Set((1L, 2L, 1L, 1333L * 1333L)),
        "only the rare-anchored pair may surface under the cap")
    } finally spark.conf.unset("spark.graft.simjoin.maxPairingDf")
    // default cap (1000) doesn't bind: y pairs too, x-pair score unchanged
    val full = RetrievalQueries.q154SparseSimJoin(spark, dir)
      .select("d1", "d2", "n_shared_terms", "score")
      .as[(Long, Long, Long, Long)].collect().toSet
    val y2 = 750L * 750L // idf(y) = (6-3)*1000 div 4 = 750
    assert(full === Set(
      (1L, 2L, 1L, 1333L * 1333L),
      (3L, 4L, 1L, y2), (3L, 5L, 1L, y2), (4L, 5L, 1L, y2)))
    // recall contract direction: capped results ⊆ uncapped, scores equal
    assert(Set((1L, 2L, 1L, 1333L * 1333L)).subsetOf(full))
  }

  test("q144: ranked output is deterministic and respects the score order") {
    val a = RetrievalQueries.q144Bm25Search(spark, sfDir).collect()
    val b = RetrievalQueries.q144Bm25Search(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq, "same corpus must produce identical ranking")
    assert(a.nonEmpty && a.length <= 20)
    val scores = a.map(_.getAs[Long]("score_scaled")).toSeq
    assert(scores === scores.sorted.reverse, "scores must be non-increasing")
    assert(a.forall(r => (1L to 3L).contains(r.getAs[Long]("n_terms_matched"))))
  }

  test("q222: KWIC hit count equals the corpus occurrence count of the " +
    "term, every match column is the term, and contexts are <= 3 tokens") {
    val rows = SparkEntry.queries("q222_kwic_concordance")(spark, sfDir)
      .collect()
    val occ = Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") === "scan").count()
    assert(rows.length.toLong === occ)
    rows.foreach { r =>
      assert(r.getAs[String]("match_term") === "scan")
      val l = r.getAs[String]("left_ctx")
      val rt = r.getAs[String]("right_ctx")
      assert(l.isEmpty || l.split(" ").length <= 3)
      assert(rt.isEmpty || rt.split(" ").length <= 3)
      // a full left context ends right before the match position
      if (r.getAs[Long]("pos") > 3) assert(l.split(" ").length === 3)
    }
    // conf round-trip: a different term changes the result set
    spark.conf.set("spark.graft.kwic.term", "vector")
    try {
      val alt = SparkEntry.queries("q222_kwic_concordance")(spark, sfDir)
        .select("match_term").distinct().collect()
      assert(alt.map(_.getString(0)).toSeq === Seq("vector"))
    } finally spark.conf.unset("spark.graft.kwic.term")
  }

  test("q285: RRF scores replay from the ranks, both rankers contribute, " +
    "and the rankers genuinely disagree") {
    val rows = RetrievalQueries.q285RrfFusion(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (ra, rb) = (r.getAs[Int]("rank_bm25"), r.getAs[Int]("rank_prop"))
      assert(ra >= 0 && ra <= 20 && rb >= 0 && rb <= 20)
      assert(ra > 0 || rb > 0, "doc retrieved by neither ranker")
      val expected =
        (if (ra > 0) 1000000L / (60 + ra) else 0L) +
          (if (rb > 0) 1000000L / (60 + rb) else 0L)
      assert(r.getAs[Long]("rrf_scaled") === expected, r.toString)
    }
    // descending fusion order with doc tiebreak
    val scores = rows.map(_.getAs[Long]("rrf_scaled")).toSeq
    assert(scores === scores.sorted.reverse)
    // non-vacuity: fusion only matters if the rankers disagree somewhere
    val both = rows.filter(r =>
      r.getAs[Int]("rank_bm25") > 0 && r.getAs[Int]("rank_prop") > 0)
    assert(both.nonEmpty, "rankings share no docs - fusion untested")
    assert(rows.exists(r => r.getAs[Int]("rank_bm25") !=
      r.getAs[Int]("rank_prop")),
      "rankers fully agree - fusion is vacuous on this corpus")
  }

  test("q294: rank-eval invariants — hits monotone in k, bounded by both " +
    "k and the relevant total, and the scaled metrics replay exactly") {
    val rows = RetrievalQueries.q294RankEval(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(5L, 10L, 20L))
    val relTotals = rows.map(_.getAs[Long]("rel_total")).distinct
    assert(relTotals.length === 1 && relTotals.head > 0,
      "relevance label must be non-trivial on this corpus")
    var prevHits = -1L
    rows.foreach { r =>
      val (k, hits, rel) = (r.getAs[Long]("k"), r.getAs[Long]("hits"),
        r.getAs[Long]("rel_total"))
      assert(hits >= prevHits, "hits@k must be monotone in k")
      assert(hits <= k && hits <= rel)
      assert(r.getAs[Long]("precision_scaled") === hits * 1000000L / k)
      assert(r.getAs[Long]("recall_scaled") === hits * 1000000L / rel)
      prevHits = hits
    }
    // non-vacuity: the eval must find at least one relevant doc in the
    // top 20, else the metric row proves nothing about the ranking
    assert(rows.last.getAs[Long]("hits") > 0,
      "BM25 top-20 contains no relevant doc - eval is vacuous")
  }
}
