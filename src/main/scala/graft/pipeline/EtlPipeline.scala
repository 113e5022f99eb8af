package graft.pipeline

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.DataSource
import graft.store.DataStore

/** Post-processing hook ≙ abstract `PostProcessing.process`
  * (`services/post_processing.py:1-8`). Tier-B operators (dedup, text
  * analysis, similarity) plug in here as composable `DataFrame => DataFrame`
  * stages.
  */
trait PostProcessor {
  def process(df: DataFrame): DataFrame
}
object IdentityPostProcessor extends PostProcessor {
  def process(df: DataFrame): DataFrame = df
}

/** Pipeline composition ≙ `ETLPipeline.run()` (`services/etl_pipeline.py:1-29`):
  * fetch → transform → upsert → post-process, with stage logging. All five
  * collaborators are constructor-injected, as in the reference. Execution
  * stays lazy until the store's save action, so Catalyst optimizes the whole
  * source→transform→sink plan as one unit.
  */
final class EtlPipeline(
    source: DataSource,
    transform: DataFrame => DataFrame,
    store: DataStore,
    post: PostProcessor = IdentityPostProcessor) extends Logging {

  def run(spark: SparkSession): DataFrame = {
    logInfo("Starting ETL job")
    val data = source.fetch(spark)
    logInfo("Data fetched from source")
    val transformed = transform(data)
    logInfo("Data transformation complete")
    store.upsert(transformed)
    logInfo("Data upserted to store")
    val result = post.process(transformed)
    logInfo("Post-processing complete")
    result
  }
}
