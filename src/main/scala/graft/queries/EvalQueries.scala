package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** In-engine MODEL EVALUATION over the curation suite's own classifier:
  * the reliability diagram and the exact ROC-AUC of q136's quality scorer
  * judged against q78's heuristic gate as the reference label. Training
  * (q160), scoring (q136) and now evaluation close the classifier loop
  * without leaving the engine — at 100 TB the eval set is a table like any
  * other, and shipping scores to a driver-side sklearn pass is exactly the
  * collect() anti-pattern the suite bans.
  *
  * Both operators avoid the global-window anti-pattern: ranks come from
  * the distributed two-pass prefix-sum scaffold ([[graft.functions.PrefixSum]],
  * range exchange — q149's discipline), and the AUC runs on the
  * DISTINCT-SCORE frame, whose cardinality is bounded by the score range,
  * not the corpus.
  */
object EvalQueries {

  /** score ⋈ label frame: q136's integer score against q78's boolean gate
    * as the 0/1 reference label — one doc-keyed equi-join. */
  private def scoreLabel(spark: SparkSession, dir: String): DataFrame = {
    val s = CurationQueries.q136QualityClassifier(spark, dir)
      .select(col("doc_id"), col("score_sum"))
    val y = CurationQueries.q78QualityRepetition(spark, dir)
      .select(col("doc_id"), col("keep").cast(IntegerType).cast("long").as("y"))
    s.join(y, "doc_id")
  }

  /** RELIABILITY DIAGRAM by score decile (q207) — the calibration-shaped
    * eval every quality classifier gets before its threshold is trusted:
    * rank all docs by classifier score, cut into 10 equal-depth bins
    * (q149's exact rule, bin = (rank−1)·10 div n), and report each bin's
    * observed positive rate under the reference label in exact ppm, with
    * the bin's score span alongside. A well-behaved scorer shows
    * monotonically climbing positive rates; a flat or inverted run is the
    * "score is noise here" verdict that no single AUC number localizes.
    *
    * Scale shape: the global rank is the distributed prefix-sum scaffold
    * (range exchange on (score, doc_id) — NOT a one-partition window);
    * everything after is a 10-row aggregate. The 1-row total rides a
    * crossJoin.
    */
  def q207ReliabilityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val j = scoreLabel(spark, dir)
      .withColumn("g", lit(0)).withColumn("one", lit(1L))
    val total = j.agg(count(lit(1)).as("n"))
    graft.functions.PrefixSum
      .runningTotal(j, Seq("g"),
        Seq(col("score_sum").asc, col("doc_id").asc), "one", "rk")
      .crossJoin(total)
      .withColumn("bin", expr("((rk - 1) * 10) div n"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_pos"),
        min(col("score_sum")).as("min_score"),
        max(col("score_sum")).as("max_score"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * 1000000" +
          " div n_docs AS BIGINT)").as("pos_ppm"),
        col("min_score"), col("max_score"))
      .orderBy(col("bin"))
  }

  /** EXACT tie-aware ROC-AUC (q208) — the Mann–Whitney identity computed
    * as integers: AUC = (#{pos-neg pairs with s_p > s_n} + ½·#ties) /
    * (P·N). Instead of ranking every row, scores COLLAPSE to the
    * distinct-score frame first ((score) → pos count, neg count); a
    * prefix sum of negatives in score order then yields, for every score,
    * how many negatives sit strictly below — so concordant pairs are
    * Σ p(s)·cum_neg(<s) and tied pairs Σ p(s)·n(s), both BIGINTs, and
    * the ½ clears through the ·2 denominator. Bit-exact in both engines;
    * NULL when either class is empty (AUC undefined), loudly not 0.
    *
    * Scale shape: one (score)-keyed aggregate over the corpus — the frame
    * after it is bounded by the score RANGE (model constant), on which
    * the prefix sum and the final 1-row rollup are noise. This is the
    * histogram-AUC production recipe, not the sort-everything one.
    */
  def q208AucExact(spark: SparkSession, dir: String): DataFrame = {
    val byScore = scoreLabel(spark, dir)
      .groupBy(col("score_sum"))
      .agg(sum(col("y")).as("p"),
        (count(lit(1)) - sum(col("y"))).as("ng"))
      .withColumn("g", lit(0))
    val cum = graft.functions.PrefixSum
      .runningTotal(byScore, Seq("g"), Seq(col("score_sum").asc), "ng", "cumn")
    cum.agg(
        sum(col("p")).as("n_pos"),
        sum(col("ng")).as("n_neg"),
        sum(col("p") * (col("cumn") - col("ng"))).as("n_concordant_pairs"),
        sum(col("p") * col("ng")).as("n_tied_pairs"))
      .select(col("n_pos"), col("n_neg"),
        col("n_concordant_pairs"), col("n_tied_pairs"),
        expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE " +
          "CAST((CAST(2 * n_concordant_pairs + n_tied_pairs AS DECIMAL(38,0))" +
          " * 1000000) div (2 * n_pos * n_neg) AS BIGINT) END").as("auc_ppm"))
  }

  /** Shared oracle CTEs: q136's hashed-feature score and q78's gate label
    * joined per doc — the SQL twin of [[scoreLabel]]. */
  private val scoreLabelCtes: String =
    """d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, unnest(toks) AS f FROM d
      |  UNION ALL
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1])) AS f
      |  FROM d),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(SUM(((CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % 1024)
      |       * 2654435761 + 12345) % 201 - 100) AS BIGINT) AS score_sum
      |  FROM feats GROUP BY doc_id),
      |tri AS (
      |  SELECT doc_id, toks,
      |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |         ELSE list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS tris
      |  FROM d),
      |top AS (
      |  SELECT doc_id, MAX(c) AS max_tok FROM (
      |    SELECT doc_id, tok, COUNT(*) AS c
      |    FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
      |    GROUP BY doc_id, tok)
      |  GROUP BY doc_id),
      |lab AS (
      |  SELECT tri.doc_id,
      |    CASE WHEN len(tri.toks) >= 20
      |      AND 1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris) <= 0.2
      |      AND CAST(max_tok AS DOUBLE) / len(tri.toks) <= 0.2
      |    THEN 1 ELSE 0 END AS y
      |  FROM tri JOIN top ON tri.doc_id = top.doc_id),
      |j AS (
      |  SELECT sc.doc_id, sc.score_sum, CAST(lab.y AS BIGINT) AS y
      |  FROM sc JOIN lab USING (doc_id))""".stripMargin

  val q207Oracle: String =
    s"""WITH $scoreLabelCtes,
       |r AS (
       |  SELECT doc_id, score_sum, y,
       |    ROW_NUMBER() OVER (ORDER BY score_sum, doc_id) AS rk,
       |    COUNT(*) OVER () AS n
       |  FROM j)
       |SELECT (rk - 1) * 10 // n AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(y) AS BIGINT) AS n_pos,
       |  CAST(CAST(SUM(y) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
       |    AS pos_ppm,
       |  MIN(score_sum) AS min_score, MAX(score_sum) AS max_score
       |FROM r GROUP BY (rk - 1) * 10 // n
       |ORDER BY bin""".stripMargin

  val q208Oracle: String =
    s"""WITH $scoreLabelCtes,
       |g AS (
       |  SELECT score_sum, CAST(SUM(y) AS BIGINT) AS p,
       |    CAST(COUNT(*) - SUM(y) AS BIGINT) AS ng
       |  FROM j GROUP BY score_sum),
       |c AS (
       |  SELECT p, ng,
       |    SUM(ng) OVER (ORDER BY score_sum
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
       |  FROM g)
       |SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       |  CAST(SUM(ng) AS BIGINT) AS n_neg,
       |  CAST(SUM(p * (cumn - ng)) AS BIGINT) AS n_concordant_pairs,
       |  CAST(SUM(p * ng) AS BIGINT) AS n_tied_pairs,
       |  CASE WHEN SUM(p) = 0 OR SUM(ng) = 0 THEN NULL ELSE
       |    CAST(CAST(2 * SUM(p * (cumn - ng)) + SUM(p * ng) AS HUGEINT)
       |      * 1000000 // (2 * SUM(p) * SUM(ng)) AS BIGINT)
       |  END AS auc_ppm
       |FROM c""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_reliability_deciles" -> (q207ReliabilityDeciles _),
    "q208_auc_exact"           -> (q208AucExact _))

  val oracles: Map[String, String] = Map(
    "q207_reliability_deciles" -> q207Oracle,
    "q208_auc_exact"           -> q208Oracle)
}
