package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a named query here;
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for the driver's
  * hash-compare at sf0.01 (omitted only for non-SQL-expressible ops, which
  * get scalatest invariants instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.registry ++ Windows.registry ++ Scalars.registry ++
      EtlQueries.registry ++ TextQueries.registry ++
      SimilarityQueries.registry ++ StreamingQueries.registry ++
      ExtensionQueries.registry ++ SurfaceQueries.registry ++
      AdvancedQueries.registry ++ ApiSurfaceQueries.registry ++
      ScaleQueries.registry ++ CurationQueries.registry ++
      RelationalPlus.registry ++ GraphQueries.registry ++
      RetrievalQueries.registry ++ MiningQueries.registry ++
      CorpusQueries.registry ++ EvalQueries.registry ++
      TimeSeriesQueries.registry ++ EmbeddingQueries.registry ++
      ProfilingQueries.registry ++ graft.pipeline.CurationRun.registry ++
      graft.pipeline.RetrievalRun.registry ++
      graft.pipeline.DedupAuditRun.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Windows.oracles ++ Scalars.oracles ++
      EtlQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ StreamingQueries.oracles ++
      ExtensionQueries.oracles ++ SurfaceQueries.oracles ++
      AdvancedQueries.oracles ++ ApiSurfaceQueries.oracles ++
      ScaleQueries.oracles ++ CurationQueries.oracles ++
      RelationalPlus.oracles ++ GraphQueries.oracles ++
      RetrievalQueries.oracles ++ MiningQueries.oracles ++
      CorpusQueries.oracles ++ EvalQueries.oracles ++
      TimeSeriesQueries.oracles ++ EmbeddingQueries.oracles ++
      ProfilingQueries.oracles ++ graft.pipeline.CurationRun.oracles ++
      graft.pipeline.RetrievalRun.oracles ++
      graft.pipeline.DedupAuditRun.oracles
}
