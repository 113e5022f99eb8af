package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-15 staged-oracle rewrite surface — the sf0.1 replay path
  * that swaps the quadratic from-raw candidate join for the
  * engine-persisted pair parquet (see StagedOracles.scala). Pure JVM, no
  * Spark session: the rewrites are string-exact swaps of the fragment
  * constants that authored the oracle SQL, so everything to pin is the
  * texts themselves.
  */
class StagedOraclesSpec extends AnyFunSuite {

  private lazy val stagedMap: Map[String, String] =
    SparkEntry.oracleSql.flatMap { case (k, v) =>
      queries.StagedOracles.staged(v).map(k -> _)
    }

  test("the round-13 cascade-tier gates all have staged sf0.1 variants") {
    val tier = Set("q333_quality_canonical_map", "q341_dedup_threshold_curve",
      "q342_cluster_depth", "q350_dedup_audit_run")
    val missing = tier -- stagedMap.keySet
    assert(missing.isEmpty, s"no staged variant for: $missing")
  }

  test("staged variants read the staged_pairs view and carry no residual " +
    "quadratic doc-pair join") {
    assert(stagedMap.nonEmpty)
    stagedMap.foreach { case (k, sql) =>
      assert(sql.contains(queries.StagedOracles.PairsView),
        s"$k staged SQL never reads the staged view")
      assert(!sql.contains("FROM dl a JOIN dl b"),
        s"$k staged SQL still contains the quadratic join")
    }
  }

  test("pair precision stays re-verified from raw in every staged variant " +
    "(the confirmation filter survives the rewrite)") {
    stagedMap.foreach { case (k, sql) =>
      // the three confirmation forms: the aliased j filter, q341's integer
      // cross-multiplication, and q268's inline ratio filter
      assert(sql.contains("j >= 0.8") || sql.contains("inter * 5 >= uni * 4")
        || sql.contains("list_concat(a.sh, b.sh))) >= 0.8"),
        s"$k staged SQL dropped the exact-Jaccard confirmation")
    }
  }

  test("rewrite coverage is exactly the shared-fragment cascade inventory " +
    "(a new cascade oracle must either reuse a fragment or extend " +
    "StagedOracles deliberately)") {
    // Only oracles authored from the three shared fragment constants
    // rewrite; cascade variants with bespoke quadratic joins (q189's
    // paragraph level, q210's .shs signature space, q266/q268's
    // source-keyed pairs) intentionally do NOT — their sf0.1 handling is a
    // separate decision, not a silent fall-through.
    val expected = Set(
      "q36_dedup_minhash", "q72_dedup_clusters", "q119_dedup_best_of_cluster",
      "q141_neardup_components", "q150_incremental_components",
      "q182_contrastive_pairs", "q184_dedup_aware_folds",
      "q200_triangle_census", "q204_kcore", "q210_lsh_param_audit",
      "q268_syndication_matrix", "q269_dedup_map",
      "q270_curation_run", "q273_pair_features", "q280_cluster_cohesion",
      "q284_effective_corpus", "q308_incr_components_prod",
      "q325_degree_assortativity", "q333_quality_canonical_map",
      "q341_dedup_threshold_curve", "q342_cluster_depth",
      "q350_dedup_audit_run")
    assert(stagedMap.keySet === expected,
      s"staged coverage changed: +${stagedMap.keySet -- expected} " +
        s"-${expected -- stagedMap.keySet}")
  }

  test("staged output is a fixed point: re-applying the rewrite changes " +
    "nothing (no fragment survives, no double-rewrite possible)") {
    stagedMap.foreach { case (k, sql) =>
      assert(queries.StagedOracles.staged(sql).isEmpty,
        s"$k staged SQL still matches a rewrite fragment")
    }
  }

  test("the from-raw gate oracles are untouched by the staged machinery") {
    // oracleSql must never serve staged SQL — from-raw is the sf0.01 hard
    // gate; the staged map is a separate dump (oracle_sql_staged.json)
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains(queries.StagedOracles.PairsView),
        s"$k gate oracle references the staged view")
    }
  }
}
