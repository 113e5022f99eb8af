package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet testdata table loaders (TESTDATA.md / FIXTURES.md §B).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and reads its
  * inputs through these helpers so the scan layer is uniform: parquet with
  * Catalyst predicate pushdown + column pruning left fully enabled (no
  * caching, no collect). At 100 TB these become partitioned/parquet-on-object
  * -store scans; nothing here assumes local file layout beyond the directory
  * naming contract.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
