package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model.{ConnectorConfig, JdbcConfig, SourceType}

/** Source connectors (SURVEY.md §2.A A1–A7, §2.C).
  *
  * Each source is a pure `SparkSession => DataFrame` — reads stay lazy, so
  * Catalyst predicate pushdown / column pruning apply to whatever query is
  * composed on top. Nothing here materializes rows on the driver except
  * [[LocalRowsSource]], which exists only for parity with the reference's
  * ODBC path (`services/data_source.py:136-183`) — that path is explicitly
  * anti-scale (full driver materialization) and is documented as such.
  */
trait DataSource {
  def fetch(spark: SparkSession): DataFrame
}

/** Multiline permissive JSON ≙ reference `services/data_source.py:27-39`.
  * `multiLine = false` reads standard JSON-lines (the format Spark writes).
  */
final case class JsonSource(path: String, multiLine: Boolean = true) extends DataSource {
  def fetch(spark: SparkSession): DataFrame =
    spark.read
      .option("multiLine", multiLine.toString)
      .option("mode", "PERMISSIVE")
      .json(path)
}

/** Header + inferSchema CSV ≙ reference `services/data_source.py:41-52`. */
final case class CsvSource(path: String) extends DataSource {
  def fetch(spark: SparkSession): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
}

/** rowTag XML ≙ reference `services/data_source.py:54-68`. Spark 4 ships a
  * native XML source, so the `com.databricks:spark-xml` package pin
  * (reference `lambda_function.py:120`) is unnecessary.
  */
final case class XmlSource(path: String, rowTag: String) extends DataSource {
  def fetch(spark: SparkSession): DataFrame =
    spark.read.option("rowTag", rowTag).xml(path)
}

/** Parquet source — the testdata-native scan path (TESTDATA.md). */
final case class ParquetSource(path: String) extends DataSource {
  def fetch(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** ORC source — the second columnar lake format Spark ships natively.
  * Same scan machinery as parquet (vectorized reader, predicate pushdown,
  * column pruning via ReadSchema), so everything the engine proves about
  * parquet scans holds for ORC-resident data too.
  */
final case class OrcSource(path: String) extends DataSource {
  def fetch(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** JDBC table/query source ≙ reference `services/data_source.py:78-111`.
  *
  * Scale note: the reference reads whole tables on a single partition
  * (no `partitionColumn` — SURVEY.md §4). Here a partitioned read is the
  * default posture: pass `partitioning` to split the scan across executors.
  */
final case class JdbcPartitioning(column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

final case class JdbcTableSource(
    cfg: JdbcConfig,
    table: String,
    partitioning: Option[JdbcPartitioning] = None) extends DataSource {
  def fetch(spark: SparkSession): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
    partitioning.fold(base) { p =>
      base.option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound)
        .option("upperBound", p.upperBound)
        .option("numPartitions", p.numPartitions)
    }.load()
  }
}

/** Whole-query pushdown to the RDBMS ≙ reference `query` option usage
  * (`services/data_source.py:93-111`).
  */
final case class JdbcQuerySource(cfg: JdbcConfig, query: String) extends DataSource {
  def fetch(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("query", query)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .load()
}

/** Driver-side rows → DataFrame, parity with the reference ODBC path
  * (`services/data_source.py:170-180`). Anti-scale by design; kept because
  * the reference surface includes it.
  */
final case class LocalRowsSource(rows: Seq[Row], schema: StructType) extends DataSource {
  def fetch(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}

/** DSN-style connection config ≙ reference `odbc_db_config.py:6-28`
  * (`DRIVER={..};SERVER=..;DATABASE=..;UID=..;PWD=..;` key-value strings).
  * On the JVM, `java.sql.DriverManager` plays the ODBC driver manager's
  * role: the DSN fields map onto the dialect's URL template and driver
  * class, and [[connectionString]] preserves the pyodbc wire format for
  * parity/diagnostics.
  */
final case class OdbcStyleConfig(
    tpe: SourceType, server: String, port: Int, database: String,
    user: String, password: String) {
  /** The pyodbc wire format ≙ `DBConfig.get_connection_string`. */
  def connectionString: String =
    s"DRIVER={${OdbcStyleConfig.odbcDriverName(tpe)}};SERVER=$server;" +
      s"DATABASE=$database;UID=$user;PWD=$password;"
  def url: String = graft.model.JdbcConfig.urlFor(tpe, server, port, database)
  def driver: String = graft.model.JdbcConfig.driverFor(tpe)
}

object OdbcStyleConfig {
  /** Driver display names as the reference pins them
    * (`odbc_db_config.py:8,21`); other dialects get a descriptive stand-in.
    */
  def odbcDriverName(tpe: SourceType): String = tpe match {
    case SourceType.MySql    => "MySQL ODBC 9.1 Unicode Driver"
    case SourceType.Postgres => "PostgreSQL Unicode"
    case SourceType.Oracle   => "Oracle ODBC Driver"
    case SourceType.MsSql    => "ODBC Driver 18 for SQL Server"
    case SourceType.Derby    => "Apache Derby Embedded"
    case other => throw new IllegalArgumentException(s"Not a database source: $other")
  }

  /** Parse a DSN-style connection string back into a config. `PORT` is an
    * optional extra key (pyodbc drivers vary on whether it rides in SERVER);
    * absent, the dialect default applies.
    */
  def fromConnectionString(s: String, user: String = "", password: String = ""): OdbcStyleConfig = {
    val kv = s.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { part =>
      val i = part.indexOf('=')
      require(i > 0, s"malformed DSN fragment: $part")
      part.substring(0, i).toUpperCase -> part.substring(i + 1)
    }.toMap
    val drv = kv.getOrElse("DRIVER", "").stripPrefix("{").stripSuffix("}").toLowerCase
    val tpe =
      if (drv.contains("mysql")) SourceType.MySql
      else if (drv.contains("postgre")) SourceType.Postgres
      else if (drv.contains("oracle")) SourceType.Oracle
      else if (drv.contains("sql server")) SourceType.MsSql
      else if (drv.contains("derby")) SourceType.Derby
      else throw new IllegalArgumentException(s"Unrecognized ODBC driver: $drv")
    val defaultPort = tpe match {
      case SourceType.MySql => 3306
      case SourceType.Postgres => 5432
      case SourceType.Oracle => 1521
      case SourceType.MsSql => 1433
      case _ => 0
    }
    OdbcStyleConfig(
      tpe,
      kv.getOrElse("SERVER", "localhost"),
      kv.get("PORT").map(_.toInt).getOrElse(defaultPort),
      kv.getOrElse("DATABASE", ""),
      kv.getOrElse("UID", user),
      kv.getOrElse("PWD", password))
  }
}

/** LIVE ODBC-shaped source ≙ reference `DatabaseConnector`/`ODBCDataSource`
  * (`services/data_source.py:136-183`): a raw driver-manager connection
  * (connect → cursor → execute → fetchall → close), rows materialized on
  * the driver and lifted via `createDataFrame` — the exact pyodbc control
  * flow, but with a real `java.sql` transport instead of a parity stub.
  * The schema comes from `ResultSetMetaData` the way pyodbc's comes from
  * `cursor.description`.
  *
  * Anti-scale BY DESIGN (full driver materialization, as the reference) —
  * the partitioned [[JdbcTableSource]] is the production read path; this
  * exists for reference-surface completeness and small control-plane reads.
  */
final case class OdbcSource(cfg: OdbcStyleConfig, query: String) extends DataSource {
  import java.sql.DriverManager
  import org.apache.spark.sql.types._

  def fetch(spark: SparkSession): DataFrame = {
    Class.forName(cfg.driver)
    val conn = DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      val rs = conn.createStatement().executeQuery(query)
      val md = rs.getMetaData
      val n = md.getColumnCount
      // type mapping shared with the V2 connector (OdbcV2Source) — one
      // JDBC→Catalyst table, no drift between the transports
      val schema = OdbcV2Source.schemaOf(md)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (rs.next()) {
        rows += Row.fromSeq((1 to n).map { i =>
          val v: Any = schema(i - 1).dataType match {
            case BooleanType => rs.getBoolean(i)
            case IntegerType => rs.getInt(i)
            case LongType => rs.getLong(i)
            case DoubleType => rs.getDouble(i)
            case FloatType => rs.getFloat(i)
            case _: DecimalType => rs.getBigDecimal(i)
            case DateType => rs.getDate(i)
            case TimestampType => rs.getTimestamp(i)
            case BinaryType => rs.getBytes(i)
            case _ => rs.getString(i)
          }
          if (rs.wasNull()) null else v
        })
      }
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, schema)
    } finally conn.close()
  }
}

object DataSources {
  /** Liveness probe SQL per dialect — the reference's bare `SELECT 1`
    * (`services/data_source.py:93-111`) works on MySQL/Postgres/MSSQL but
    * Oracle and Derby require a FROM clause.
    */
  def probeQuery(tpe: SourceType): String = tpe match {
    case SourceType.Oracle => "SELECT 1 AS test_column FROM DUAL"
    case SourceType.Derby  => "SELECT 1 AS test_column FROM SYSIBM.SYSDUMMY1"
    case _                 => "SELECT 1 AS test_column"
  }

  /** Connection liveness probe ≙ `check_connection`'s `SELECT 1 AS
    * test_column` pushdown (`services/data_source.py:93-111`).
    */
  def checkConnection(
      spark: SparkSession,
      cfg: JdbcConfig,
      tpe: SourceType = SourceType.Postgres): Boolean =
    try {
      JdbcQuerySource(cfg, probeQuery(tpe)).fetch(spark).count() == 1L
    } catch { case _: Exception => false }

  /** Dialect-specific catalog listing ≙ `show_tables`
    * (`services/data_source.py:113-134`): per-dialect information-schema
    * subquery pushed down via `dbtable`.
    */
  def showTablesQuery(tpe: SourceType): String = tpe match {
    case SourceType.MySql =>
      "(SELECT table_name FROM information_schema.tables WHERE table_schema = DATABASE()) AS tables"
    case SourceType.Postgres =>
      "(SELECT table_name FROM information_schema.tables WHERE table_schema = 'public') AS tables"
    case SourceType.Oracle =>
      "(SELECT table_name FROM user_tables)"
    case SourceType.MsSql =>
      "(SELECT table_name FROM information_schema.tables WHERE table_type = 'BASE TABLE') AS tables"
    case SourceType.Derby =>
      "(SELECT tablename AS table_name FROM sys.systables WHERE tabletype = 'T') t"
    case other => throw new IllegalArgumentException(s"Not a JDBC source: $other")
  }

  def showTables(spark: SparkSession, cfg: JdbcConfig, tpe: SourceType): DataFrame =
    JdbcTableSource(cfg, showTablesQuery(tpe)).fetch(spark)

  /** Table-name list to the driver ≙ `lambda_function.py:162`'s
    * `select("table_name").rdd.flatMap(...).collect()` — done Dataset-native
    * (no RDD drop-down, SURVEY A8/A9).
    */
  def tableNames(tables: DataFrame): Seq[String] = {
    import tables.sparkSession.implicits._
    tables.select("table_name").as[String].collect().toSeq
  }

  /** Connector-config dispatch ≙ `lambda_function.py:99-154`. */
  def fromConnector(cfg: ConnectorConfig, table: Option[String] = None): DataSource =
    cfg.source match {
      case SourceType.Json => JsonSource(cfg.filePath.getOrElse(missing(cfg, "filePath")))
      case SourceType.Csv  => CsvSource(cfg.filePath.getOrElse(missing(cfg, "filePath")))
      case SourceType.Xml  => XmlSource(
        cfg.filePath.getOrElse(missing(cfg, "filePath")),
        cfg.rowTag.getOrElse(missing(cfg, "rowTag")))
      case SourceType.Parquet => ParquetSource(cfg.filePath.getOrElse(missing(cfg, "filePath")))
      case _ => JdbcTableSource(
        cfg.jdbc.getOrElse(missing(cfg, "jdbc")),
        table.getOrElse(missing(cfg, "table")))
    }

  private def missing(cfg: ConnectorConfig, field: String): Nothing =
    throw new IllegalArgumentException(s"Connector ${cfg.id}: missing $field")
}
