package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.Tables

/** Corpus-composition operators: the questions a dataset owner asks ABOUT
  * sources before mixing them — how much two ingest feeds overlap, and who
  * wins when the same content arrives from several feeds.
  *
  * Both operators run on content fingerprints, never on text pairs: overlap
  * is estimated from per-source bottom-k sketches (constant rows per source
  * regardless of corpus size) and duplicate ownership is resolved by one
  * fingerprint-keyed aggregate. At 100 TB neither shape grows past
  * O(corpus) + O(#sources² · k).
  */
object CorpusQueries {

  /** Plant offset for the cross-source twin corpus (distinct from the
    * near-dup family's 10M offset so the two plants never interact). */
  val SourcePlantOffset = 20000000L

  /** The synthetic corpus has no cross-source duplicates, so both operators
    * run on a planted union: every doc_id % 3 == 0 document re-appears
    * byte-identical under the NEXT source id (src7 → src8, src19 → src0).
    * The plant makes the expected overlap structure known in advance —
    * adjacent source pairs overlap, non-adjacent pairs don't — which is
    * what turns the sketch estimate and the priority matrix into checkable
    * claims rather than trivially-empty frames.
    */
  private def docsWithSourceTwins(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), col("text"), col("source")).unionAll(
      d.filter(col("doc_id") % 3 === 0).select(
        (col("doc_id") + SourcePlantOffset).as("doc_id"),
        col("text"),
        concat(lit("src"),
          ((substring(col("source"), 4, 8).cast(IntegerType) + 1) % 20)
            .cast("string")).as("source")))
  }

  /** 32-bit content fingerprint from the md5 prefix — the portable-hash
    * discipline (`Similarity.md5Hash64` rationale): bit-identical in both
    * engines, so the sketch is exactly replayable. */
  private def contentHash32(text: org.apache.spark.sql.Column) =
    conv(substring(md5(text), 1, 8), 16, 10).cast(LongType)

  /** CROSS-SOURCE OVERLAP MATRIX from mergeable BOTTOM-K sketches (q202) —
    * the "how much of source B have I already got from source A?" audit
    * that decides whether a new crawl feed is worth licensing/ingesting.
    * Doing it exactly means a distinct-count over every source pair's
    * union — a full corpus shuffle per pair. The sketch form is the
    * production answer (Broder's min-wise estimate, the bottom-k variant
    * of the MinHash the q36 dedup tier already trusts): each source is
    * reduced to its k=64 smallest 32-bit content fingerprints — a
    * MERGEABLE summary, one tiny frame per source — and for any pair the
    * Jaccard estimate is |bottom_k(A ∪ B) ∩ A_k ∩ B_k| / |bottom_k(A ∪ B)|.
    * When a source holds fewer than k items the sketch IS the set and the
    * estimate collapses to the exact Jaccard; the denominator
    * min(k, |A∪B|) makes that exactness automatic.
    *
    * Scale shape: ONE corpus scan → distinct (source, fingerprint) →
    * per-source window top-k (partition cardinality = #sources, each
    * partition k rows out — no global sort). Everything after runs on
    * #sources · k rows: the pair frame is #sources² — a registry-sized
    * constant, not data — and the pair×sketch join is an equi-join on
    * source. Sketches of a PB-scale feed are the same 64 rows.
    *
    * The DuckDB oracle replays the identical plant, fingerprint, window
    * rank and estimator, so the gate pins the estimator arithmetic
    * (integer ppm, merged-k denominator), not just row counts. The plant
    * makes ring-adjacent pairs the only overlapping ones.
    */
  def q202SourceOverlapSketch(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val items = docsWithSourceTwins(spark, dir)
      .select(col("source"), contentHash32(col("text")).as("h"))
      .distinct()
    val sketch = items
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"))
    // the source registry is a catalog, not data: #sources² pairs come
    // from exploding ONE aggregated registry row twice — a generator, not
    // a join, so no nested-loop operator ever enters the plan
    val pairs = items
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(col("ss")).as("sa"), col("ss"))
      .select(col("sa"), explode(col("ss")).as("sb"))
      .filter(col("sa") < col("sb"))
    val membership = pairs.select(col("sa"), col("sb"), col("sa").as("source"),
        lit(1).as("is_a"))
      .unionAll(pairs.select(col("sa"), col("sb"), col("sb").as("source"),
        lit(0).as("is_a")))
    val merged = membership.join(sketch, "source")
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("is_a")).as("in_a"), max(lit(1) - col("is_a")).as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rn") <= k)
    merged.groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("k_merged"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("n_both"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("k_merged"), col("n_both"),
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * 1000000" +
          " div k_merged AS BIGINT)").as("est_jaccard_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val q202Oracle: String =
    s"""WITH docs_p AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + $SourcePlantOffset, text,
       |    'src' || CAST((CAST(substr(source, 4, 8) AS INT) + 1) % 20 AS VARCHAR)
       |  FROM documents WHERE doc_id % 3 = 0),
       |items AS (
       |  SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS h
       |  FROM docs_p),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM items)
       |  WHERE rn <= 64),
       |srcs AS (SELECT DISTINCT source FROM items),
       |pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |mem AS (
       |  SELECT sa, sb, sa AS source, 1 AS is_a FROM pairs
       |  UNION ALL
       |  SELECT sa, sb, sb AS source, 0 AS is_a FROM pairs),
       |mrg AS (
       |  SELECT m.sa, m.sb, s.h,
       |    MAX(m.is_a) AS in_a, MAX(1 - m.is_a) AS in_b
       |  FROM mem m JOIN sk s ON s.source = m.source
       |  GROUP BY m.sa, m.sb, s.h),
       |rk AS (
       |  SELECT sa, sb, in_a, in_b,
       |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |  FROM mrg)
       |SELECT sa AS source_a, sb AS source_b,
       |  CAST(COUNT(*) AS BIGINT) AS k_merged,
       |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_both,
       |  CAST(CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
       |      AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS est_jaccard_ppm
       |FROM rk WHERE rn <= 64
       |GROUP BY sa, sb
       |ORDER BY source_a, source_b""".stripMargin

  /** CROSS-SOURCE DUPLICATE PRIORITY RESOLUTION (q203) — "dedup the crawl
    * against Wikipedia, not Wikipedia against the crawl". When identical
    * content arrives from several feeds, production pipelines keep the
    * copy from the most-trusted source (The Pile / Dolma source-priority
    * rule) and CHARGE the loss to the losing feed — the per-(winner,
    * loser) loss matrix is what tells an operator that feed X is 40%
    * re-hosted feed-Y content. Priority here is the source's numeric rank
    * (src0 strongest), ties broken by doc_id, so the winner is a total
    * order and the result is replayable.
    *
    * Scale shape: ONE fingerprint-keyed aggregate picks each content
    * group's winner (`min(struct(priority, doc_id, source))` — the q169
    * argmin idiom, partial-aggregable), then one equi-join on the
    * fingerprint charges every losing copy to its winner, and a
    * low-cardinality (#sources²-bounded) aggregate emits the matrix. Two
    * shuffles on the same key — AQE collapses them to one exchange — and
    * nothing all-pairs.
    */
  def q203CrossSourcePriority(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithSourceTwins(spark, dir)
      .select(col("doc_id"), col("source"),
        substring(col("source"), 4, 8).cast(IntegerType).as("prio"),
        graft.functions.Similarity.md5Hash64(col("text")).as("h"))
    val winners = docs.groupBy(col("h"))
      .agg(min(struct(col("prio"), col("doc_id"), col("source"))).as("w"))
      .select(col("h"), col("w.doc_id").as("kept_doc"),
        col("w.source").as("source_kept"))
    docs.join(winners, "h")
      .filter(col("doc_id") =!= col("kept_doc"))
      .groupBy(col("source_kept"), col("source").as("source_dropped"))
      .agg(count(lit(1)).as("n_dropped"))
      .orderBy(col("source_kept"), col("source_dropped"))
  }

  val q203Oracle: String =
    s"""WITH docs_p AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + $SourcePlantOffset, text,
       |    'src' || CAST((CAST(substr(source, 4, 8) AS INT) + 1) % 20 AS VARCHAR)
       |  FROM documents WHERE doc_id % 3 = 0),
       |d AS (
       |  SELECT doc_id, source, CAST(substr(source, 4, 8) AS INT) AS prio,
       |    CAST((CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS HUGEINT)
       |          * 4294967296
       |          + CAST('0x' || substr(md5(text), 9, 8) AS BIGINT))
       |         - CASE WHEN CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)
       |                     >= 2147483648
       |                THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END
       |         AS BIGINT) AS h
       |  FROM docs_p),
       |w AS (
       |  SELECT h, doc_id AS kept_doc, source AS source_kept FROM (
       |    SELECT h, doc_id, source,
       |      row_number() OVER (PARTITION BY h ORDER BY prio, doc_id) AS rn
       |    FROM d)
       |  WHERE rn = 1)
       |SELECT w.source_kept, d.source AS source_dropped,
       |  CAST(COUNT(*) AS BIGINT) AS n_dropped
       |FROM d JOIN w ON d.h = w.h
       |WHERE d.doc_id <> w.kept_doc
       |GROUP BY w.source_kept, d.source
       |ORDER BY source_kept, source_dropped""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_source_overlap_sketch" -> (q202SourceOverlapSketch _),
    "q203_cross_source_priority" -> (q203CrossSourcePriority _))

  val oracles: Map[String, String] = Map(
    "q202_source_overlap_sketch" -> q202Oracle,
    "q203_cross_source_priority" -> q203Oracle)
}
