package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{JdbcConfig, SourceType}
import graft.sources.DataSources
import graft.store.JdbcStore

/** Golden-SQL pins for every dialect-varying string the JDBC layer emits —
  * MySQL, Postgres, Oracle, MSSQL (plus Derby, the one dialect that also
  * runs live in JdbcSpec). Only Derby executes in this sandbox, so the
  * other four dialects' SQL text is the contract surface: these tests make
  * any drift in url templates, driver classes, probe/catalog queries, or
  * the staged-upsert statements an explicit, reviewed diff instead of a
  * silent change that only a production database would catch.
  *
  * Templates mirror the reference's `DATABASE_CONFIG`
  * (`/root/reference/lambda_function.py:30-51`) and `show_tables`
  * (`/root/reference/services/data_source.py:113-134`).
  */
class DialectSpec extends AnyFunSuite {
  import SourceType._

  test("JDBC url templates per dialect (golden)") {
    def url(t: SourceType) = JdbcConfig.urlFor(t, "dbhost", 5555, "corpus")
    assert(url(MySql) === "jdbc:mysql://dbhost:5555/corpus")
    assert(url(Postgres) === "jdbc:postgresql://dbhost:5555/corpus")
    assert(url(Oracle) === "jdbc:oracle:thin:@//dbhost:5555/corpus")
    assert(url(MsSql) === "jdbc:sqlserver://dbhost:5555;databaseName=corpus")
  }

  test("driver classes per dialect (golden)") {
    assert(JdbcConfig.driverFor(MySql) === "com.mysql.cj.jdbc.Driver")
    assert(JdbcConfig.driverFor(Postgres) === "org.postgresql.Driver")
    assert(JdbcConfig.driverFor(Oracle) === "oracle.jdbc.driver.OracleDriver")
    assert(JdbcConfig.driverFor(MsSql) ===
      "com.microsoft.sqlserver.jdbc.SQLServerDriver")
  }

  test("liveness probe per dialect (golden): Oracle needs FROM DUAL") {
    assert(DataSources.probeQuery(MySql) === "SELECT 1 AS test_column")
    assert(DataSources.probeQuery(Postgres) === "SELECT 1 AS test_column")
    assert(DataSources.probeQuery(MsSql) === "SELECT 1 AS test_column")
    assert(DataSources.probeQuery(Oracle) ===
      "SELECT 1 AS test_column FROM DUAL")
  }

  test("catalog listing per dialect (golden)") {
    assert(DataSources.showTablesQuery(MySql) ===
      "(SELECT table_name FROM information_schema.tables WHERE table_schema = DATABASE()) AS tables")
    assert(DataSources.showTablesQuery(Postgres) ===
      "(SELECT table_name FROM information_schema.tables WHERE table_schema = 'public') AS tables")
    assert(DataSources.showTablesQuery(Oracle) ===
      "(SELECT table_name FROM user_tables)")
    assert(DataSources.showTablesQuery(MsSql) ===
      "(SELECT table_name FROM information_schema.tables WHERE table_type = 'BASE TABLE') AS tables")
  }

  test("identifier quote per dialect: MySQL backticks, ANSI for the rest") {
    assert(JdbcStore.quoteFor(MySql) === "`")
    assert(JdbcStore.quoteFor(Postgres) === "\"")
    assert(JdbcStore.quoteFor(Oracle) === "\"")
    assert(JdbcStore.quoteFor(MsSql) === "\"")
    assert(JdbcStore.quoteFor(Derby) === "\"")
  }

  test("staged-upsert statements, ANSI-quoted dialects (golden)") {
    val q = JdbcStore.quoteFor(Postgres)
    assert(JdbcStore.deleteMatchedSql("orders", "order_id", q) ===
      """DELETE FROM orders WHERE "order_id" IN (SELECT "order_id" FROM orders_staging)""")
    assert(JdbcStore.insertAllSql("orders", Seq("order_id", "status", "total"), q) ===
      """INSERT INTO orders ("order_id", "status", "total") SELECT "order_id", "status", "total" FROM orders_staging""")
    assert(JdbcStore.dropStagingSql("orders") === "DROP TABLE orders_staging")
  }

  test("staged-upsert statements, MySQL backtick quoting (golden)") {
    val q = JdbcStore.quoteFor(MySql)
    assert(JdbcStore.deleteMatchedSql("orders", "order_id", q) ===
      "DELETE FROM orders WHERE `order_id` IN (SELECT `order_id` FROM orders_staging)")
    assert(JdbcStore.insertAllSql("orders", Seq("order_id", "total"), q) ===
      "INSERT INTO orders (`order_id`, `total`) SELECT `order_id`, `total` FROM orders_staging")
  }

  test("exactly-once commit-log statements (golden)") {
    val q = JdbcStore.quoteFor(Postgres)
    assert(JdbcStore.createCommitLogSql("orders", q) ===
      """CREATE TABLE orders_commits ("batch_id" BIGINT PRIMARY KEY)""")
    assert(JdbcStore.commitProbeSql("orders", 42L, q) ===
      """SELECT COUNT(*) FROM orders_commits WHERE "batch_id" = 42""")
    assert(JdbcStore.commitRecordSql("orders", 42L) ===
      "INSERT INTO orders_commits VALUES (42)")
    val mq = JdbcStore.quoteFor(MySql)
    assert(JdbcStore.createCommitLogSql("orders", mq) ===
      "CREATE TABLE orders_commits (`batch_id` BIGINT PRIMARY KEY)")
  }
}
