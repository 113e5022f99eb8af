package graft.model

/** Control-plane data model (SURVEY.md §1.4).
  *
  * Reproduces the *shape* of the reference's connector metadata — a DynamoDB
  * item `{id, source, file_path?, row_tag?, formData:{host,port,database,
  * username,password...}}` (reference `utils/helper_functions.py:15-52`,
  * `lambda_function.py:99-124`) — as plain Scala config. The AWS/crypto
  * plumbing is deployment machinery, not query capability; AES-GCM password
  * decryption survives as a Spark expression (see
  * [[graft.transform.Transforms.aesRoundtrip]]).
  */
sealed trait SourceType
object SourceType {
  case object Json    extends SourceType
  case object Csv     extends SourceType
  case object Xml     extends SourceType
  case object Parquet extends SourceType
  case object MySql   extends SourceType
  case object Postgres extends SourceType
  case object Oracle  extends SourceType
  case object MsSql   extends SourceType
  /** Embedded test dialect (ships with Spark) — lets the full JDBC control
    * flow run end-to-end without a database server. Not a reference
    * dialect; everything else treats it as a normal JDBC source.
    */
  case object Derby   extends SourceType

  /** Dispatch table ≙ reference `DATASOURCE_MAP` (`services/data_source.py:9-21`). */
  def fromString(s: String): SourceType = s.toLowerCase match {
    case "json"          => Json
    case "csv"           => Csv
    case "xml"           => Xml
    case "parquet"       => Parquet
    case "mysql"         => MySql
    case "postgresql" | "postgres" => Postgres
    case "oracle"        => Oracle
    case "mssql"         => MsSql
    case "derby"         => Derby
    case other => throw new IllegalArgumentException(s"Unsupported data source: $other")
  }

  val jdbcTypes: Set[SourceType] = Set(MySql, Postgres, Oracle, MsSql, Derby)
}

/** JDBC connection config ≙ reference `DATABASE_CONFIG` url templates
  * (`lambda_function.py:30-51`).
  */
final case class JdbcConfig(
    url: String,
    user: String,
    password: String,
    driver: String)

object JdbcConfig {
  /** Url templates per dialect, as in reference `lambda_function.py:30-51`. */
  def urlFor(tpe: SourceType, host: String, port: Int, database: String): String = tpe match {
    case SourceType.MySql    => s"jdbc:mysql://$host:$port/$database"
    case SourceType.Postgres => s"jdbc:postgresql://$host:$port/$database"
    case SourceType.Oracle   => s"jdbc:oracle:thin:@//$host:$port/$database"
    case SourceType.MsSql    => s"jdbc:sqlserver://$host:$port;databaseName=$database"
    case SourceType.Derby    => s"jdbc:derby:memory:$database;create=true"
    case other => throw new IllegalArgumentException(s"Not a JDBC source: $other")
  }

  /** Driver classes per dialect ≙ reference `DATABASE_CONFIG[*]["driver"]`
    * (`lambda_function.py:30-51`).
    */
  def driverFor(tpe: SourceType): String = tpe match {
    case SourceType.MySql    => "com.mysql.cj.jdbc.Driver"
    case SourceType.Postgres => "org.postgresql.Driver"
    case SourceType.Oracle   => "oracle.jdbc.driver.OracleDriver"
    case SourceType.MsSql    => "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    case SourceType.Derby    => "org.apache.derby.jdbc.EmbeddedDriver"
    case other => throw new IllegalArgumentException(s"Not a JDBC source: $other")
  }

  /** Assemble a connection config from dialect + creds (reference
    * `lambda_function.py:137-148`).
    */
  def forDialect(
      tpe: SourceType, host: String, port: Int, database: String,
      user: String, password: String): JdbcConfig =
    JdbcConfig(urlFor(tpe, host, port, database), user, password, driverFor(tpe))
}

/** One target column ≙ reference YAML `target_schema.columns[]` entry
  * `{source, name, type, format?}` (`services/transformer.py:19-29`).
  */
final case class ColumnMapping(
    name: String,
    source: String,
    dataType: String,
    format: Option[String] = None)

/** Explicit target schema driving rename+cast projection (A11). */
final case class TargetSchema(columns: Seq[ColumnMapping])

/** Connector metadata item ≙ reference DynamoDB connector item. */
final case class ConnectorConfig(
    id: String,
    source: SourceType,
    filePath: Option[String] = None,
    rowTag: Option[String] = None,
    jdbc: Option[JdbcConfig] = None)
