package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{ConnectorConfig, Credentials, JdbcConfig, SourceType, TargetSchema}
import graft.sources.{DataSource, DataSources, JdbcTableSource}
import graft.store.{DataStore, ShowStore}
import graft.transform.Transforms

/** The reference's flagship control flow (`lambda_function.py:84-203`) as
  * one composable, runnable job:
  *
  *   connector lookup → credential decrypt → source dispatch →
  *   (JDBC: connection probe → catalog listing → table validation) →
  *   fetch → schema-map → upsert → post-process.
  *
  * Differences from the reference, by design: the table choice is a
  * parameter instead of an interactive `input()` loop; credential material
  * and connector records come from injected maps instead of DynamoDB
  * (the AWS transport is deployment machinery, the shapes are identical);
  * failures THROW instead of logging-and-returning-None, so a scheduler
  * can retry.
  */
object JobRunner {

  /** Encrypted credential wire shape ≙ the reference's DynamoDB `formData`
    * (`utils/helper_functions.py:15-52`): AES-256-GCM hex fields; the key
    * arrives separately (env `KEY_HEX` in the reference).
    */
  final case class EncryptedCreds(
      host: String,
      port: Int,
      database: String,
      username: String,
      encryptedPasswordHex: String,
      tagHex: String,
      ivHex: String)

  /** Connector registry record ≙ one `CONNECTOR_DYNAMO_TABLE` item. */
  final case class ConnectorRecord(
      id: String,
      source: SourceType,
      filePath: Option[String] = None,
      rowTag: Option[String] = None,
      creds: Option[EncryptedCreds] = None)

  final case class JobReport(
      connectorId: String,
      sourceType: SourceType,
      tables: Seq[String],
      result: DataFrame)

  /** Run the composed flow for `connectionId`.
    *
    * @param connectors  connector registry (≙ CONNECTOR_DYNAMO_TABLE)
    * @param table       table to fetch for JDBC sources (≙ the reference's
    *                    validated interactive choice, lambda_function.py:185-196)
    * @param keyHex      AES key for credential decrypt (≙ env KEY_HEX)
    * @param mappings    per-connector target schemas (≙ MODEL_MAPPING_DYNAMO_TABLE)
    * @param store       sink (defaults to the reference's df.show() behavior)
    */
  def run(
      spark: SparkSession,
      connectors: Map[String, ConnectorRecord],
      connectionId: String,
      table: Option[String] = None,
      keyHex: String = "",
      mappings: Map[String, TargetSchema] = Map.empty,
      store: DataStore = new ShowStore,
      post: PostProcessor = IdentityPostProcessor,
      logger: EtlLogger = new EtlLogger()): JobReport = {

    val record = connectors.getOrElse(connectionId, {
      logger.error(s"Connection parameters not found in registry for id: $connectionId")
      throw new NoSuchElementException(s"no connector: $connectionId")
    })

    val (source, tables): (DataSource, Seq[String]) =
      if (!SourceType.jdbcTypes.contains(record.source)) {
        (DataSources.fromConnector(ConnectorConfig(
          record.id, record.source, record.filePath, record.rowTag)), Nil)
      } else {
        val creds = record.creds.getOrElse {
          logger.error(s"No db creds found for id: $connectionId, source: ${record.source}")
          throw new IllegalArgumentException(s"connector $connectionId: missing creds")
        }
        val password = Credentials.decryptPassword(
          creds.encryptedPasswordHex, creds.tagHex, keyHex, creds.ivHex)
        val cfg = JdbcConfig.forDialect(record.source, creds.host, creds.port,
          creds.database, creds.username, password)
        if (!DataSources.checkConnection(spark, cfg, record.source)) {
          logger.error(s"Failed to connect to the ${record.source} database.")
          throw new IllegalStateException(s"connection probe failed: $connectionId")
        }
        logger.info(s"Connection to conn id: $connectionId, ${record.source} database successful.")
        val names = DataSources.tableNames(
          DataSources.showTables(spark, cfg, record.source))
        if (names.isEmpty) logger.warning("No tables found in the database.")
        else logger.info(s"Tables fetched from the database: ${names.mkString(", ")}")
        val chosen = table.getOrElse {
          throw new IllegalArgumentException(
            s"connector $connectionId: a table name is required for JDBC sources")
        }
        // ≙ the reference's input() validation loop, minus the prompt.
        // Fetch under the CATALOG's spelling, not the caller's: validation
        // is case-insensitive, but a case-sensitive catalog (quoted
        // Postgres identifiers) would resolve the caller's casing to a
        // different — or no — table
        val resolved = names.find(_.equalsIgnoreCase(chosen)).getOrElse(
          throw new IllegalArgumentException(
            s"Invalid table name: $chosen (catalog: ${names.mkString(", ")})"))
        (JdbcTableSource(cfg, resolved), names)
      }

    val transform: DataFrame => DataFrame =
      mappings.get(connectionId) match {
        case Some(schema) =>
          logger.info(s"Model mapping fetched for Connector Id: $connectionId")
          Transforms.mapColumnsToTarget(_, schema)
        case None =>
          logger.warning(s"No model mappings for the Connector Id: $connectionId")
          identity
      }

    val result = new EtlPipeline(source, transform, store, post).run(spark)
    JobReport(connectionId, record.source, tables, result)
  }
}
