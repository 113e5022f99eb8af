package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ConnectorConfig, SourceType}
import graft.sources._

class SourcesSpec extends AnyFunSuite with SparkSpec {

  private def tmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-src")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("JsonSource reads multiline permissive JSON (A1)") {
    val path = tmp("data.json",
      """[
        |  {"id": 1, "name": "alpha", "age": 30, "city": "rome"},
        |  {"id": 2, "name": "beta",  "age": 25, "city": "oslo"},
        |  {"id": 3, "name": "gamma", "age": 41, "city": "lima"}
        |]""".stripMargin)
    val df = JsonSource(path).fetch(spark)
    assert(df.count() === 3)
    assert(df.columns.sorted.toSeq === Seq("age", "city", "id", "name"))
  }

  test("CsvSource reads header + inferSchema CSV with quoted commas (A2)") {
    val path = tmp("data.csv",
      """Index,Customer Id,First Name,Company
        |1,abc123,Jane,"Widgets, Inc"
        |2,def456,Ravi,Gears Ltd
        |""".stripMargin)
    val df = CsvSource(path).fetch(spark)
    assert(df.count() === 2)
    assert(df.schema("Index").dataType === IntegerType)
    assert(df.where(df("Company") === "Widgets, Inc").count() === 1)
  }

  test("XmlSource reads rowTag XML natively on Spark 4 (A3)") {
    val path = tmp("data.xml",
      """<records>
        |  <record><id>1</id><name>alpha</name><age>30</age></record>
        |  <record><id>2</id><name>beta</name><age>25</age></record>
        |</records>""".stripMargin)
    val df = XmlSource(path, rowTag = "record").fetch(spark)
    assert(df.count() === 2)
    assert(df.columns.sorted.toSeq === Seq("age", "id", "name"))
  }

  test("LocalRowsSource parallelizes driver rows (A7 parity)") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    val df = LocalRowsSource(Seq(Row(1, "a"), Row(2, "b")), schema).fetch(spark)
    assert(df.count() === 2)
  }

  test("ParquetSource reads testdata") {
    val df = ParquetSource(s"$sfDir/region.parquet").fetch(spark)
    assert(df.count() === 5)
  }

  test("source dispatch mirrors DATASOURCE_MAP validation (A23)") {
    assert(SourceType.fromString("postgresql") === SourceType.Postgres)
    intercept[IllegalArgumentException](SourceType.fromString("mongodb"))
    val cfg = ConnectorConfig("c1", SourceType.Json, filePath = Some("/x.json"))
    assert(DataSources.fromConnector(cfg) === JsonSource("/x.json"))
    intercept[IllegalArgumentException](
      DataSources.fromConnector(ConnectorConfig("c2", SourceType.Xml,
        filePath = Some("/x.xml")))) // missing rowTag
  }

  test("showTablesQuery covers the four dialects (A6)") {
    assert(DataSources.showTablesQuery(SourceType.MySql).contains("information_schema"))
    assert(DataSources.showTablesQuery(SourceType.Oracle).contains("user_tables"))
    assert(DataSources.showTablesQuery(SourceType.Postgres).contains("'public'"))
    assert(DataSources.showTablesQuery(SourceType.MsSql).contains("BASE TABLE"))
  }

  test("OdbcSource live transport: connect → execute → fetchall → DataFrame (A7 live)") {
    // Derby's embedded JDBC driver stands in for the ODBC driver manager —
    // same raw connect/cursor/fetch control flow as the reference's pyodbc
    val cfg = OdbcStyleConfig(SourceType.Derby, "localhost", 0, "odbcsrc", "app", "app")
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE odbc_t (id INT NOT NULL, name VARCHAR(20), amount DECIMAL(10,2), flag BOOLEAN)")
    st.execute("INSERT INTO odbc_t VALUES (1, 'alpha', 12.50, true), (2, NULL, 0.25, false)")
    st.close(); conn.close()

    val df = OdbcSource(cfg, "SELECT id, name, amount, flag FROM odbc_t ORDER BY id").fetch(spark)
    assert(df.schema.fieldNames.toSeq === Seq("ID", "NAME", "AMOUNT", "FLAG"))
    assert(df.schema("ID").dataType === IntegerType)
    assert(df.schema("AMOUNT").dataType.typeName.startsWith("decimal"))
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(0) === 1 && rows(0).getString(1) === "alpha")
    assert(rows(1).isNullAt(1), "NULL must survive the transport")
    assert(rows(0).getDecimal(2).doubleValue() === 12.50)
  }

  test("graft-odbc V2 source: executor-side reads with pruning, pushdown, and range partitions") {
    val cfg = OdbcStyleConfig(SourceType.Derby, "localhost", 0, "odbcv2", "app", "app")
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE v2_t ("id" INT NOT NULL, "grp" VARCHAR(8), "amount" DOUBLE)""")
    (0 until 100).grouped(20).foreach { batch =>
      st.execute("INSERT INTO v2_t VALUES " + batch.map(i =>
        s"($i, 'g${i % 3}', ${i * 1.5})").mkString(", "))
    }
    st.close(); conn.close()

    def reader = spark.read.format("graft-odbc")
      .option("url", cfg.url).option("dbtable", "v2_t")

    // full scan
    assert(reader.load().count() === 100)

    // pruning + filter pushdown reach the scan
    val q = reader.load().filter(col("grp") === "g1").select("id", "amount")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("grp"),
      s"filter must push into the source:\n$plan")
    val rows = q.collect()
    assert(rows.length === 33 && rows.forall(r => r.getInt(0) % 3 == 1))

    // range-partitioned read: same result, 4 executor-side slices
    val parts = reader
      .option("partitionColumn", "id").option("lowerBound", "0")
      .option("upperBound", "100").option("numPartitions", "4")
      .load()
    assert(parts.rdd.getNumPartitions === 4)
    assert(parts.count() === 100)
    assert(parts.agg(sum("id")).head.getLong(0) === (0 until 100).sum)

    // unsupported filter shapes stay in Spark (correctness over pushdown)
    val like = reader.load().filter(col("grp").startsWith("g")).count()
    assert(like === 100)

    // mixed-case option keys must reach the executor-side reader too
    // (options are case-insensitive on the driver path; the snapshot the
    // readers get must match)
    val mixed = spark.read.format("graft-odbc")
      .option("URL", cfg.url).option("DBTable", "v2_t").load().count()
    assert(mixed === 100)

    // a backslash-bearing string literal is NOT pushed (dialect-sensitive
    // escaping) but still filters correctly in Spark
    assert(reader.load().filter(col("grp") === "g\\1").count() === 0)
  }

  test("graft-odbc V2 source: aggregate, limit, and top-N pushdown") {
    val cfg = OdbcStyleConfig(SourceType.Derby, "localhost", 0, "odbcv2agg", "app", "app")
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE v2_a ("id" INT NOT NULL, "grp" VARCHAR(8), "amount" DOUBLE)""")
    (0 until 60).grouped(20).foreach { batch =>
      st.execute("INSERT INTO v2_a VALUES " + batch.map(i =>
        s"($i, 'g${i % 3}', ${i * 1.5})").mkString(", "))
    }
    st.close(); conn.close()

    def reader = spark.read.format("graft-odbc")
      .option("url", cfg.url).option("dbtable", "v2_a")

    // COMPLETE aggregate pushdown: the GROUP BY runs in the database and
    // the scan's output IS the 3-row rollup — no Spark-side HashAggregate
    // over base rows
    val agg = reader.load().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("amount").as("s"),
        min("id").as("mn"), max("id").as("mx"))
      .orderBy("grp")
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("PushedAggregates: [") && aggPlan.contains("COUNT(*)")
      && aggPlan.contains("SUM(") && !aggPlan.contains("HashAggregate"),
      s"aggregates must push COMPLETE into the source:\n$aggPlan")
    val rows = agg.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    val expected = (0 until 60).groupBy(i => s"g${i % 3}").toSeq.sortBy(_._1)
      .map { case (g, is) =>
        (g, is.size.toLong, is.map(_ * 1.5).sum, is.min, is.max) }
    assert(rows.toSeq === expected)

    // a range-partitioned read must NOT push the aggregate (complete mode
    // cannot merge per-slice results) — and must still be correct
    val parts = reader
      .option("partitionColumn", "id").option("lowerBound", "0")
      .option("upperBound", "60").option("numPartitions", "3").load()
      .groupBy("grp").count()
    val partsPlan = parts.queryExecution.executedPlan.toString
    assert(!partsPlan.contains("PushedAggregates"),
      s"partitioned scan must keep aggregation in Spark:\n$partsPlan")
    assert(parts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("g0" -> 20L, "g1" -> 20L, "g2" -> 20L))

    // LIMIT pushes as FETCH FIRST (partial: Spark re-limits on top)
    val lim = reader.load().limit(5)
    assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit: 5"))
    assert(lim.count() === 5)

    // ORDER BY + LIMIT pushes as top-N; result order verified end-to-end
    val top = reader.load().orderBy(col("amount").desc).limit(3)
    val topPlan = top.queryExecution.executedPlan.toString
    assert(topPlan.contains("PushedTopN: [ORDER BY") && topPlan.contains("DESC"),
      s"top-N must push into the source:\n$topPlan")
    assert(top.collect().map(_.getInt(0)).toSeq === Seq(59, 58, 57))

    // top-N OVER A PUSHED AGGREGATE must stay in Spark: the compiled
    // SELECT list has no agg_i aliases, so a pushed ORDER BY on the
    // aggregate output would reference a column the database query
    // doesn't have (SQLException at runtime before the fix)
    val aggTop = reader.load().groupBy("grp")
      .agg(sum("amount").as("s")).orderBy(col("s").desc).limit(2)
    val aggTopPlan = aggTop.queryExecution.executedPlan.toString
    assert(aggTopPlan.contains("PushedAggregates: ["), aggTopPlan)
    assert(!aggTopPlan.contains("PushedTopN"),
      s"topN must not push over a pushed aggregate:\n$aggTopPlan")
    assert(aggTop.collect().map(_.getString(0)).toSeq === Seq("g2", "g1"))
  }

  test("graft-odbc V2 source: filter + aggregate compose in one pushed query; global agg works") {
    val cfg = OdbcStyleConfig(SourceType.Derby, "localhost", 0, "odbcv2agg2", "app", "app")
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE v2_b ("id" INT NOT NULL, "grp" VARCHAR(8), "amount" DOUBLE)""")
    st.execute("INSERT INTO v2_b VALUES " + (0 until 40).map(i =>
      s"($i, 'g${i % 2}', ${i * 2.0})").mkString(", "))
    st.close(); conn.close()

    def reader = spark.read.format("graft-odbc")
      .option("url", cfg.url).option("dbtable", "v2_b")

    // WHERE + GROUP BY both compiled into the single database query
    val q = reader.load().filter(col("id") >= 10)
      .groupBy("grp").agg(sum("amount").as("s")).orderBy("grp")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [") &&
      plan.contains("PushedFilters: [GreaterThanOrEqual(id,10)"),
      s"filter and aggregate must both push:\n$plan")
    assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ===
      (10 until 40).groupBy(i => s"g${i % 2}").map { case (g, is) => g -> is.map(_ * 2.0).sum })

    // global aggregate (no GROUP BY): one row from the database
    val g = reader.load().agg(count(lit(1)).as("n"), max("id").as("mx"))
    assert(g.queryExecution.executedPlan.toString.contains("PushedAggregates: [COUNT(*)"),
      "global aggregate must push")
    assert(g.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((40L, 39)))
  }

  test("OdbcStyleConfig: pyodbc wire format round-trips through the parser") {
    val cfg = OdbcStyleConfig(SourceType.Postgres, "db.example", 5432, "appdb", "u1", "secret")
    assert(cfg.connectionString ===
      "DRIVER={PostgreSQL Unicode};SERVER=db.example;DATABASE=appdb;UID=u1;PWD=secret;")
    val parsed = OdbcStyleConfig.fromConnectionString(cfg.connectionString)
    assert(parsed === cfg) // default Postgres port 5432 fills back in
    val mysql = OdbcStyleConfig.fromConnectionString(
      "DRIVER={MySQL ODBC 9.1 Unicode Driver};SERVER=h;PORT=3307;DATABASE=d;UID=u;PWD=p;")
    assert(mysql.tpe === SourceType.MySql && mysql.port === 3307)
    intercept[IllegalArgumentException](
      OdbcStyleConfig.fromConnectionString("DRIVER={SQLite3};SERVER=x;"))
  }
}
