package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column combinators (north-star tier: language-ID, quality
  * scoring, token counting, fingerprinting).
  *
  * Everything here is built from `org.apache.spark.sql.functions._` —
  * including the higher-order array functions (`transform`/`filter`/
  * `aggregate`) — so every operator is a codegen'd Catalyst expression that
  * runs columnar on executors. No UDFs, no driver round-trips: these scale
  * to 100 TB because they are ordinary projections.
  */
object TextFunctions {

  /** Whitespace tokenizer. Trimmed first: both Spark `split` (limit -1) and
    * DuckDB `regexp_split_to_array` keep a trailing empty token on trailing
    * whitespace, so trimming keeps the engines aligned AND the token list
    * clean.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Punctuation character count (fixed class, matches the oracle's
    * regexp_replace with 'g').
    */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Σ length(token) — exact integer arithmetic in both engines. */
  def totalTokenLen(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t)), lit(0), (acc, x) => acc + x)

  /** How many tokens fall in `words` (occurrence count, not distinct —
    * `array_intersect` would dedup).
    */
  def vocabHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedlit(words), t)))

  /** Composite quality score in [0,1]: length saturation, punctuation
    * penalty, lexical diversity. Formula is plain double arithmetic executed
    * in the same operation order as the SQL oracle, so results are
    * bit-identical.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val nChar = length(text).cast(DoubleType)
    val diversity = distinctTokenCount(text).cast(DoubleType) / nTok
    val lengthSat = least(nTok / lit(100.0), lit(1.0))
    val punctRatio = punctCount(text).cast(DoubleType) / nChar
    lit(0.5) * lengthSat + lit(0.3) * (lit(1.0) - punctRatio) + lit(0.2) * diversity
  }

  /** Language profiles for the n-gram/stopword-heuristic language ID.
    * On real corpora these are per-language stopword lists; the synthetic
    * `documents` table shares one vocabulary across langs, so here the
    * profiles verify the *mechanics* (deterministic argmax over profile
    * hits), not linguistic accuracy.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "fast"),
    "de" -> Seq("join", "row", "stream", "merge"),
    "fr" -> Seq("value", "key", "sort", "line"),
    "es" -> Seq("order", "batch", "scan", "part"),
    "zh" -> Seq("spark", "group", "table", "hash"))

  /** Deterministic argmax with first-listed-language tie-break: a language
    * wins only if it strictly beats every *earlier* profile and
    * ties-or-beats every later one — identical CASE cascade in the oracle.
    */
  def langId(text: Column): Column = {
    val hits = langProfiles.map { case (lang, words) => lang -> vocabHits(text, words) }
    val cascade = hits.zipWithIndex.map { case ((lang, h), i) =>
      val beatsEarlier = hits.take(i).map(_._2).map(h > _)
      val tiesLater = hits.drop(i + 1).map(_._2).map(h >= _)
      (lang, (beatsEarlier ++ tiesLater).foldLeft(lit(true))(_ && _))
    }
    cascade.reverse.foldLeft(lit("und")) { case (acc, (lang, cond)) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** BPE-ish tokenizer counts via a regex lexer: letter runs, digit runs,
    * single non-alphanumeric symbols — the standard pre-tokenization split.
    */
  def wordTokenCount(text: Column): Column = regexp_count(text, lit("[A-Za-z]+"))
  def numberTokenCount(text: Column): Column = regexp_count(text, lit("[0-9]+"))
  def symbolTokenCount(text: Column): Column = regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Polynomial rolling-hash fingerprint over the token stream, mod 2^31-1
    * (accumulator stays < 2^36, so no overflow in any engine). Equal texts
    * ⇒ equal fingerprints; order-sensitive, unlike a bag-of-words hash.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31L + ascii(t) * 131L + length(t), lit(2147483647L)))
}
