package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.RetrievalRun
import graft.queries.{MiningQueries, RetrievalQueries}

/** The composed retrieval-pipeline contract (q309): staged-postings
  * execution must be RESULT-IDENTICAL to gate mode, and must genuinely
  * scan the staged parquet (one corpus tokenize for the whole tier — not
  * a silent re-derive per consumer).
  */
class RetrievalRunSpec extends AnyFunSuite with SparkSpec {

  test("q309: composed run (staged postings) equals gate mode") {
    val composed = RetrievalRun.run(spark, sfDir).collect().toSeq
    val gate = RetrievalRun.gateSummary(spark, sfDir).collect().toSeq
    assert(composed === gate, s"composed=$composed\ngate=$gate")
    // seven stages, every one non-degenerate
    assert(composed.map(_.getString(0)) ===
      Seq("bm25", "inverted_index", "postings", "rank_eval", "rrf_fusion",
        "sparse_simjoin", "term_projection"))
    assert(composed.forall(_.getLong(1) > 0), s"empty stage in $composed")
  }

  test("q309: consumers really scan the staged postings parquet") {
    val path = RetrievalRun.stagedPath(sfDir)
    RetrievalQueries.termFrequencies(spark, sfDir)
      .write.mode("overwrite").parquet(path)
    spark.conf.set(RetrievalQueries.PostingsConf, path)
    try {
      // match on the staging-root name: Spark truncates long scan paths
      // in plan strings, so the leaf dir may display truncated
      val stagingRoot = "graft_retrieval_run"
      Seq(
        RetrievalQueries.q144Bm25Search(spark, sfDir),
        RetrievalQueries.q294RankEval(spark, sfDir),
        MiningQueries.q300TermProjection(spark, sfDir)
      ).foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains(stagingRoot), plan.take(2000))
        assert(!plan.contains("documents.parquet"), plan.take(2000))
      }
      // and the reused paths stay result-identical to the defaults
      spark.conf.unset(RetrievalQueries.PostingsConf)
      val bmGate = RetrievalQueries.q144Bm25Search(spark, sfDir).collect().toSeq
      val projGate = MiningQueries.q300TermProjection(spark, sfDir).collect().toSeq
      spark.conf.set(RetrievalQueries.PostingsConf, path)
      assert(RetrievalQueries.q144Bm25Search(spark, sfDir).collect().toSeq
        === bmGate)
      assert(MiningQueries.q300TermProjection(spark, sfDir).collect().toSeq
        === projGate)
    } finally spark.conf.unset(RetrievalQueries.PostingsConf)
  }

  test("q309: run() and gateSummary refuse to start half-composed") {
    spark.conf.set(RetrievalQueries.PostingsConf, "/tmp/nonexistent")
    try {
      intercept[IllegalArgumentException] {
        RetrievalRun.gateSummary(spark, sfDir)
      }
      intercept[IllegalArgumentException] {
        RetrievalRun.run(spark, sfDir)
      }
    } finally spark.conf.unset(RetrievalQueries.PostingsConf)
  }
}
