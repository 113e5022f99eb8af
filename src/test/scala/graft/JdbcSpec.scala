package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.JdbcConfig
import graft.sources.{DataSources, JdbcQuerySource, JdbcTableSource}
import graft.store.JdbcStore

/** Integration tests for the JDBC source/sink path against embedded Derby
  * (ships with Spark) — the reference's MySQL/Postgres/Oracle/MSSQL JDBC
  * surface (A4–A6, A14–A15) exercised against a real java.sql database.
  */
class JdbcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val cfg = JdbcConfig(
    url = "jdbc:derby:memory:graftdb;create=true",
    user = "",
    password = "",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(cfg.url)
    try f(c) finally c.close()
  }

  test("JDBC table scan reads a seeded table (A4)") {
    withConn { c =>
      val st = c.createStatement()
      // quoted lowercase columns: matches how Spark's JDBC writer creates
      // the staging table, so the upsert's quoted key references line up
      st.execute("CREATE TABLE users (\"id\" INT PRIMARY KEY, \"name\" VARCHAR(255))")
      st.execute("INSERT INTO users VALUES (1, 'ada'), (2, 'grace'), (3, 'edsger')")
      st.close()
    }
    val df = JdbcTableSource(cfg, "users").fetch(spark)
    assert(df.count() === 3)
    assert(df.columns.map(_.toLowerCase).sorted.toSeq === Seq("id", "name"))
  }

  test("JDBC query pushdown executes remotely (A5)") {
    val df = JdbcQuerySource(cfg, "SELECT COUNT(*) AS n FROM users").fetch(spark)
    assert(df.head().getAs[Number](0).longValue() === 3L)
  }

  test("checkConnection probes with SELECT 1 (A5)") {
    // Derby needs a FROM clause; the probe's portable form still works via
    // the source, so assert the negative path too
    assert(!DataSources.checkConnection(spark,
      cfg.copy(url = "jdbc:derby:memory:doesnotexist")))
  }

  test("JdbcStore staged upsert: delete-matched + insert + drop staging (A14/A15)") {
    val staging = Seq((2, "GRACE"), (4, "katherine")).toDF("id", "name")
    new JdbcStore(cfg, "users", "id").upsert(staging)
    val after = JdbcTableSource(cfg, "users").fetch(spark)
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(after === Seq((1, "ada"), (2, "GRACE"), (3, "edsger"), (4, "katherine")))
    // staging table dropped
    val tables = JdbcTableSource(cfg,
      "(SELECT tablename FROM sys.systables WHERE tabletype = 'T') t").fetch(spark)
    import spark.implicits._
    val names = tables.as[String].collect().map(_.toLowerCase).toSet
    assert(!names.contains("users_staging"))
  }

  test("upsertBatch is exactly-once under batch replay (streaming sink contract)") {
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE xo_t (\"k\" INT PRIMARY KEY, \"v\" INT)")
      st.execute("INSERT INTO xo_t VALUES (1, 10), (2, 20)")
      st.close()
    }
    val store = new JdbcStore(cfg, "xo_t", "k")
    def state() = JdbcTableSource(cfg, "xo_t").fetch(spark)
      .orderBy("k").as[(Int, Int)].collect().toSeq

    store.upsertBatch(Seq((2, 21), (3, 30)).toDF("k", "v"), batchId = 0L)
    val afterB0 = state()
    assert(afterB0 === Seq((1, 10), (2, 21), (3, 30)))

    // REPLAY of batch 0 with DIFFERENT (stale) content — Structured
    // Streaming can re-run a batch after a sink crash; the commit log
    // must make it a no-op, not a second application
    store.upsertBatch(Seq((2, 99)).toDF("k", "v"), batchId = 0L)
    assert(state() === afterB0, "replayed batch must not re-apply")

    // the next batch id applies normally
    store.upsertBatch(Seq((2, 22)).toDF("k", "v"), batchId = 1L)
    assert(state() === Seq((1, 10), (2, 22), (3, 30)))
  }

  test("tableNames collects the catalog list Dataset-native (A8/A9)") {
    val tables = JdbcTableSource(cfg,
      "(SELECT tablename AS table_name FROM sys.systables WHERE tabletype = 'T') t")
      .fetch(spark)
    val names = DataSources.tableNames(tables).map(_.toLowerCase)
    assert(names.contains("users"))
  }

  test("partitioned JDBC read splits the scan (scale posture)") {
    val df = JdbcTableSource(cfg, "users",
      Some(graft.sources.JdbcPartitioning("id", 1, 5, 2))).fetch(spark)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 4)
  }
}
