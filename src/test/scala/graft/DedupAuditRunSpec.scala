package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CurationRun, DedupAuditRun}
import graft.queries.GraphQueries

/** The composed dedup-governance contract (q350): persisted-intermediate
  * execution must be RESULT-IDENTICAL to gate mode, and must genuinely
  * read the persisted pair frame and component table — one confirm
  * cascade and one contraction for the whole six-audit battery.
  */
class DedupAuditRunSpec extends AnyFunSuite with SparkSpec {

  test("q350: composed run (persisted pairs + components) equals gate mode") {
    val composed = DedupAuditRun.run(spark, sfDir).collect().toSeq
    val gate = DedupAuditRun.gateSummary(spark, sfDir).collect().toSeq
    assert(composed === gate, s"composed=$composed\ngate=$gate")
    assert(composed.map(_.getString(0)) ===
      Seq("a_dedup_map", "b_quality_map", "c_cohesion", "d_assortativity",
        "e_depth", "f_threshold_curve"))
    assert(composed.forall(_.getLong(1) > 0), s"empty stage in $composed")
  }

  test("q350: composed-mode consumers really scan the staged intermediates") {
    val (pairPath, compPath) = DedupAuditRun.stagedPaths(sfDir)
    graft.queries.SimilarityQueries.derivedNearDupPairs(spark, sfDir)
      .write.mode("overwrite").parquet(pairPath)
    spark.conf.set(CurationRun.NearDupPairConf, pairPath)
    try {
      GraphQueries.q141NearDupComponents(spark, sfDir)
        .write.mode("overwrite").parquet(compPath)
      spark.conf.set(CurationRun.ComponentConf, compPath)
      val stagingRoot = "graft_dedup_audit"
      Seq(
        GraphQueries.q333QualityCanonicalMap(spark, sfDir),
        GraphQueries.q280ClusterCohesion(spark, sfDir)).foreach { df =>
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains(stagingRoot), p.take(2000))
        assert(!p.contains("minhashsignature"),
          "pair cascade must not re-derive behind the staged scan")
      }
    } finally {
      spark.conf.unset(CurationRun.NearDupPairConf)
      spark.conf.unset(CurationRun.ComponentConf)
    }
  }

  test("q350: gateSummary refuses to run half-composed") {
    spark.conf.set(CurationRun.NearDupPairConf, "/tmp/nonexistent")
    try {
      intercept[IllegalArgumentException] {
        DedupAuditRun.gateSummary(spark, sfDir)
      }
    } finally spark.conf.unset(CurationRun.NearDupPairConf)
  }
}
