package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over `documents` (north-star tier: B17 + language
  * ID, quality scoring, token counting, fingerprinting).
  *
  * All operators are single-pass projections/aggregations over codegen'd
  * higher-order array expressions — a 100 TB corpus shards by document with
  * zero shuffle for the per-document stats.
  */
object TextQueries {

  /** Per-document stats + composite quality score (B17). */
  def q32TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        tokenCount(col("text")).as("n_tokens"),
        distinctTokenCount(col("text")).as("n_distinct"),
        totalTokenLen(col("text")).as("sum_token_len"),
        (totalTokenLen(col("text")).cast(DoubleType) /
          tokenCount(col("text"))).as("avg_token_len"),
        round(qualityScore(col("text")), 6).as("quality"))
      .orderBy(col("doc_id"))

  // SQL mirror of TextFunctions: toks = regexp_split_to_array(trim(text)).
  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  val q32Oracle: String =
    s"""SELECT doc_id,
       |  CAST(LENGTH(text) AS INTEGER) AS n_chars_calc,
       |  CAST(len($toksSql) AS INTEGER) AS n_tokens,
       |  CAST(len(list_distinct($toksSql)) AS INTEGER) AS n_distinct,
       |  CAST(list_sum(list_transform($toksSql, t -> length(t))) AS INTEGER) AS sum_token_len,
       |  CAST(list_sum(list_transform($toksSql, t -> length(t))) AS DOUBLE) / len($toksSql) AS avg_token_len,
       |  ROUND(0.5 * LEAST(len($toksSql) / 100.0, 1.0)
       |      + 0.3 * (1.0 - CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / LENGTH(text))
       |      + 0.2 * (CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql)), 6) AS quality
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Stopword-profile language ID with a deterministic argmax cascade.
    * The oracle replays the identical CASE logic, so the gate verifies the
    * operator end-to-end.
    */
  def q33LangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        Seq(
          col("doc_id"),
          col("lang").as("lang_label"),
          langId(col("text")).as("lang_pred")) ++
        langProfiles.map { case (l, ws) =>
          vocabHits(col("text"), ws).cast(IntegerType).as(s"hits_$l")
        }: _*)
      .orderBy(col("doc_id"))

  val q33Oracle: String = {
    def hits(words: Seq[String]): String =
      s"len(list_filter($toksSql, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"
    val h = langProfiles.map { case (l, ws) => l -> hits(ws) }.toMap
    // identical cascade: a language wins iff it strictly beats all earlier
    // profiles and ties-or-beats all later ones
    val langs = langProfiles.map(_._1)
    val cases = langs.zipWithIndex.map { case (l, i) =>
      val conds =
        langs.take(i).map(e => s"${h(l)} > ${h(e)}") ++
        langs.drop(i + 1).map(e => s"${h(l)} >= ${h(e)}")
      s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
    }
    s"""SELECT doc_id, lang AS lang_label,
       |  CASE ${cases.mkString(" ")} ELSE 'und' END AS lang_pred,
       |  ${langs.map(l => s"CAST(${h(l)} AS INTEGER) AS hits_$l").mkString(",\n  ")}
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish regex-lexer token counting (letter runs / digit runs / symbols). */
  def q34TokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        wordTokenCount(col("text")).cast(IntegerType).as("n_word_tokens"),
        numberTokenCount(col("text")).cast(IntegerType).as("n_number_tokens"),
        symbolTokenCount(col("text")).cast(IntegerType).as("n_symbol_tokens"))
      .orderBy(col("doc_id"))

  val q34Oracle: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_word_tokens,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_tokens,
      |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INTEGER) AS n_symbol_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Order-sensitive rolling-hash document fingerprint. The oracle
    * replays the fold in DuckDB: list_reduce has no initial accumulator,
    * but the fold's first step from acc=0 is `0*31 + u1 = u1` — exactly
    * list_reduce's seed — so the two are step-identical.
    */
  def q35Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val q35Oracle: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    list_transform(regexp_split_to_array(trim(text), '\s+'),
      |      t -> CAST(ascii(t) AS BIGINT) * 131 + length(t)) AS us
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN len(us) = 0 THEN CAST(0 AS BIGINT)
      |       ELSE list_reduce(us, (a, b) -> (a * 31 + b) % 2147483647) END AS fp
      |FROM u
      |ORDER BY doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_text_stats"   -> (q32TextStats _),
    "q33_lang_id"      -> (q33LangId _),
    "q34_token_counts" -> (q34TokenCounts _),
    "q35_fingerprint"  -> (q35Fingerprint _))

  val oracles: Map[String, String] = Map(
    "q32_text_stats"   -> q32Oracle,
    "q33_lang_id"      -> q33Oracle,
    "q34_token_counts" -> q34Oracle,
    "q35_fingerprint"  -> q35Oracle)
}
