package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Embedding-space diagnostics — the statistics a vector corpus needs
  * before anyone trusts ANN results over it: the feature covariance
  * matrix (whitening / collapsed-dimension detection) and per-label
  * centroid drift (are the classes actually separated?). Both run on the
  * suite's 1/16 integer grid (q85's convention: q(x) = floor(16x + ½)),
  * which makes every moment an exact integer in both engines — the
  * floats stop at the quantizer.
  */
object EmbeddingQueries {

  /** embeddings quantized to the 1/16 grid, as LONG components. */
  private def gridded(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 16 + lit(0.5)).cast(LongType)).as("q"))

  /** EMBEDDING COVARIANCE MATRIX (q226) — the d×d second-moment summary
    * (upper triangle, d = 64 → 2 080 rows) of the quantized embedding
    * cloud: for dimensions i ≤ j, the exact integer n·Σqᵢqⱼ − Σqᵢ·Σqⱼ
    * (= n²·cov on the grid). Collapsed dimensions (cov_q = 0 on the
    * diagonal) and redundant pairs fall straight out of it; a whitening
    * or PCA pass consumes these sums as-is.
    *
    * Scale shape: each row fans out to its d(d+1)/2 index pairs —
    * that IS the computation (every row contributes every product);
    * partial aggregation collapses the shuffle to the 2 080 (i, j)
    * cells regardless of corpus size. Grid values |q| ≤ 48-ish keep
    * n·Σqᵢqⱼ inside BIGINT up to ~4·10¹⁵ rows — no DECIMAL needed on
    * the Spark side; the oracle mirrors with HUGEINT then casts.
    */
  def q226EmbeddingCovariance(spark: SparkSession, dir: String): DataFrame = {
    val v = gridded(spark, dir)
    val d = 64
    val pairs = v.select(
      explode(transform(sequence(lit(0), lit(d - 1)), i => i)).as("i"),
      col("q"))
    val cells = pairs.select(col("i"),
        explode(transform(sequence(col("i"), lit(d - 1)), j => j)).as("j"),
        element_at(col("q"), col("i") + 1).as("qi"),
        element_at(col("q"), col("j") + 1).as("qj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("sum_i"),
        sum(col("qj")).as("sum_j"),
        sum(col("qi") * col("qj")).as("sum_ij"))
    cells.select(col("i").cast(LongType).as("i"),
        col("j").cast(LongType).as("j"), col("n"),
        col("sum_i"), col("sum_j"), col("sum_ij"),
        (col("n") * col("sum_ij") - col("sum_i") * col("sum_j")).as("cov_q"))
      .orderBy(col("i"), col("j"))
  }

  val q226Oracle: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(FLOOR(x * 16 + 0.5) AS BIGINT)) AS q
      |  FROM embeddings),
      |cells AS (
      |  SELECT i, j,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(q[i + 1]) AS BIGINT) AS sum_i,
      |    CAST(SUM(q[j + 1]) AS BIGINT) AS sum_j,
      |    CAST(SUM(q[i + 1] * q[j + 1]) AS BIGINT) AS sum_ij
      |  FROM v,
      |    UNNEST(range(0, 64)) AS a(i),
      |    UNNEST(range(0, 64)) AS b(j)
      |  WHERE j >= i
      |  GROUP BY i, j)
      |SELECT i, j, n, sum_i, sum_j, sum_ij,
      |  CAST(CAST(n AS HUGEINT) * sum_ij
      |    - CAST(sum_i AS HUGEINT) * sum_j AS BIGINT) AS cov_q
      |FROM cells
      |ORDER BY i, j""".stripMargin

  /** PER-LABEL CENTROID DRIFT (q227) — pairwise squared distance between
    * class centroids on the grid, as the exact rational
    * Σₖ(s₁ₖn₂ − s₂ₖn₁)² / (n₁n₂)², emitted ×10⁶ by integral division
    * (dist2_ppm). The "are my labels separated at all?" check an
    * embedding-based curation step runs before trusting label-driven
    * sampling; near-zero drift between two labels means the classifier
    * upstream collapsed them. Numerators promote to DECIMAL(38,0) —
    * exact up to ~10⁸ rows per label at grid scale — with the q144
    * raise_error guard beyond.
    *
    * Scale shape: one per-(label, dim) aggregate (explode ×64, map-side
    * combine → |label|·64 rows), then an all-pairs join over LABELS
    * (tiny), never over rows.
    */
  def q227CentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val sums = gridded(spark, dir)
      .select(col("label"), posexplode(col("q")).as(Seq("k", "qk")))
      .groupBy(col("label"), col("k"))
      .agg(sum(col("qk")).as("s"), count(lit(1)).as("n"))
    val a = sums.select(col("label").as("la"), col("k"),
      col("s").as("sa"), col("n").as("na"))
    val b = sums.select(col("label").as("lb"), col("k"),
      col("s").as("sb"), col("n").as("nb"))
    a.join(b, Seq("k")).filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        sum(expr(
          """CASE WHEN na > 100000000 OR nb > 100000000
            | THEN CAST(raise_error(
            |   'q227: label population exceeds the DECIMAL(38) drift budget')
            |   AS DECIMAL(38,0))
            | ELSE CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na
            | END *
            | (CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)
            |""".stripMargin)).as("num"))
      .select(col("la").cast(LongType).as("label_a"),
        col("lb").cast(LongType).as("label_b"),
        col("na"), col("nb"),
        expr("""CAST(num * 1000000 div
          | (CAST(na AS DECIMAL(38,0)) * nb * na * nb) AS BIGINT)
          |""".stripMargin).as("dist2_ppm"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val q227Oracle: String =
    """WITH v AS (
      |  SELECT label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(FLOOR(x * 16 + 0.5) AS BIGINT)) AS q
      |  FROM embeddings),
      |s AS (
      |  SELECT label, k,
      |    CAST(SUM(q[k + 1]) AS BIGINT) AS s,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM v, UNNEST(range(0, 64)) AS t(k)
      |  GROUP BY label, k),
      |p AS (
      |  SELECT a.label AS la, b.label AS lb, a.n AS na, b.n AS nb,
      |    SUM((CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)
      |      * (CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)) AS num
      |  FROM s a JOIN s b ON a.k = b.k AND a.label < b.label
      |  GROUP BY 1, 2, 3, 4)
      |SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
      |  na, nb,
      |  CAST(num * 1000000
      |    // (CAST(na AS HUGEINT) * nb * na * nb) AS BIGINT) AS dist2_ppm
      |FROM p
      |ORDER BY label_a, label_b""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q226_embedding_covariance" -> (q226EmbeddingCovariance _),
    "q227_centroid_drift"       -> (q227CentroidDrift _))

  val oracles: Map[String, String] = Map(
    "q226_embedding_covariance" -> q226Oracle,
    "q227_centroid_drift"       -> q227Oracle)
}
