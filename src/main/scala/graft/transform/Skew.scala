package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for 100 TB joins/aggregations (SURVEY §7 /
  * builder north star). AQE's skew-join splitting handles most cases at
  * runtime; these are the explicit forms for when a hot key is KNOWN
  * (e.g. the null key, a celebrity user) and deterministic plans are
  * wanted.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (keys, salt),
    * then merge across salts. The first shuffle spreads a hot key over
    * `saltBuckets` reducers; the second is tiny (one row per key×salt).
    * `partials` maps each input-level aggregate to (partial expr, merge
    * expr on the partial's column name).
    *
    * Salt is derived from a hash of stable columns — deterministic across
    * runs and retries, unlike rand()-based salting, which breaks task
    * retry idempotency.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[Column],
      saltBuckets: Int,
      partialAggs: Seq[Column],
      mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(saltFrom: _*), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: the left's hot keys spread
    * over `saltBuckets` partitions; the (small-ish) right side is
    * replicated across every salt value via an exploded literal range.
    * Result is identical to `left.join(right, keys)` — only the shuffle
    * layout changes.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    // salt must VARY WITHIN a key to spread a hot key — hash the whole row,
    // not the join keys (hashing only the keys would keep each hot key in
    // one bucket and change nothing)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "__salt")
      .drop("__salt")
  }
}
