package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
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
}
