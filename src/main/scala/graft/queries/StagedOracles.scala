package graft.queries

/** STAGED-INTERMEDIATE ORACLE VARIANTS (round 15) — the sf0.1 replay path.
  *
  * The near-dup cascade oracles re-derive the confirmed-pair set from the
  * raw corpus with a quadratic length-prefiltered exact-Jaccard join — the
  * right HARD GATE at sf0.01 (it independently proves the engine's
  * MinHash-LSH banding has perfect recall on the gate corpus), but
  * unrunnable at sf0.1: the engine completes the whole q328–q350 tier in
  * ~54 s there while a single from-raw DuckDB replay exceeds 45 minutes
  * (PLANS.md round-14 scope note). The 10×-scale verification therefore
  * swaps EXACTLY the quadratic candidate scan for a read of the
  * engine-persisted pair parquet (the same artifact q350's composed run
  * stages), registered in DuckDB as the [[PairsView]] view:
  *
  *   - everything DOWNSTREAM of the pair set — shingling, exact Jaccard,
  *     transitive closure, survivor election, every audit statistic — is
  *     still re-derived by DuckDB from the raw corpus;
  *   - each staged pair's Jaccard is RE-VERIFIED from the raw shingle sets
  *     (the rewrites keep the `j >= 0.8` / `inter*5 >= uni*4` confirmation
  *     on recomputed values), so pair PRECISION stays independently
  *     checked at sf0.1; only candidate RECALL is carried over from the
  *     sf0.01 gate, where the identical derivation code is proven exact
  *     against the exhaustive join.
  *
  * The rewrites are byte-exact swaps of the shared fragment constants that
  * AUTHORED the oracle SQL ([[GraphQueries.oraclePairCte]],
  * [[SimilarityQueries.oracleExactPairs]],
  * [[SimilarityQueries.oracleScoredCte]]) — no regex surgery — and a
  * residual-quadratic-join check fails loudly if an oracle mixes a
  * rewritten fragment with an unrecognized cascade variant.
  */
object StagedOracles {

  /** DuckDB view name the staged variants read; the harness registers it
    * over the engine-persisted confirmed-pair parquet (id_a, id_b, …) —
    * e.g. the `neardup_pairs` dir under
    * [[graft.pipeline.DedupAuditRun.stagedPaths]]. */
  val PairsView = "staged_pairs"

  private val stagedPairCte: String =
    s"""p AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT s.id_a, s.id_b,
       |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.sh, b.sh))) AS j
       |    FROM $PairsView s
       |    JOIN dl a ON a.doc_id = s.id_a
       |    JOIN dl b ON b.doc_id = s.id_b)
       |  WHERE j >= 0.8)""".stripMargin

  private val stagedExactPairs: String =
    s"""SELECT s.id_a, s.id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.sh, b.sh))) AS j
       |  FROM $PairsView s
       |  JOIN dl a ON a.doc_id = s.id_a
       |  JOIN dl b ON b.doc_id = s.id_b""".stripMargin

  private val stagedScoredCte: String =
    s"""scored AS (
       |  SELECT CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |    CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT)
       |      AS uni
       |  FROM $PairsView s
       |  JOIN dl a ON a.doc_id = s.id_a
       |  JOIN dl b ON b.doc_id = s.id_b)""".stripMargin

  private val stagedTruthCte: String =
    s"""truth AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT s.id_a, s.id_b,
       |      CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.shs, b.shs))) AS j
       |    FROM $PairsView s
       |    JOIN dl a ON a.doc_id = s.id_a
       |    JOIN dl b ON b.doc_id = s.id_b)
       |  WHERE j >= 0.8)""".stripMargin

  // q268's pairs are oriented by SOURCE order, not doc-id order; each
  // unordered staged pair is re-oriented and same-source pairs (excluded
  // by the original's strict a.source < b.source) are filtered out.
  private val stagedSourcePairsCte: String =
    s"""pairs AS (
       |  SELECT CASE WHEN a.source < b.source THEN a.source ELSE b.source END AS src_a,
       |    CASE WHEN a.source < b.source THEN b.source ELSE a.source END AS src_b,
       |    CASE WHEN a.source < b.source THEN a.doc_id ELSE b.doc_id END AS id_a,
       |    CASE WHEN a.source < b.source THEN b.doc_id ELSE a.doc_id END AS id_b
       |  FROM $PairsView s
       |  JOIN dl a ON a.doc_id = s.id_a
       |  JOIN dl b ON b.doc_id = s.id_b
       |  WHERE a.source <> b.source
       |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)""".stripMargin

  private[queries] val rewrites: Seq[(String, String)] = Seq(
    GraphQueries.oraclePairCte -> stagedPairCte,
    SimilarityQueries.oracleScoredCte -> stagedScoredCte,
    SimilarityQueries.oracleExactPairs -> stagedExactPairs,
    EvalQueries.oracleTruthCte -> stagedTruthCte,
    SimilarityQueries.oracleSourcePairsCte -> stagedSourcePairsCte)

  /** The staged variant of `sql`, or None when no cascade fragment appears
    * (the query's from-raw oracle is already sf0.1-runnable as authored). */
  def staged(sql: String): Option[String] = {
    val out = rewrites.foldLeft(sql) { case (s, (from, to)) =>
      s.replace(from, to)
    }
    if (out == sql) None
    else {
      // an oracle that mixes a known fragment with an unrecognized
      // quadratic variant must fail the dump, not silently keep the
      // unrunnable join in its "staged" SQL
      require(!out.contains("FROM dl a JOIN dl b"),
        "residual quadratic doc-pair join after staged rewrite")
      Some(out)
    }
  }
}
