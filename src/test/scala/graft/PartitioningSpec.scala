package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CsvSource, JsonSource}

/** Partitioned-layout pruning and permissive-mode reader semantics. */
class PartitioningSpec extends AnyFunSuite with SparkSpec {

  test("hive-partitioned writes prune at the scan (PartitionFilters)") {
    val dir = Files.createTempDirectory("graft-part").resolve("orders").toString
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    // pruned read returns exactly the partition's rows
    val expected = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(filtered.count() === expected)
  }

  test("PERMISSIVE JSON keeps malformed rows as nulls instead of failing (A1)") {
    val dir = Files.createTempDirectory("graft-perm")
    val f = dir.resolve("data.json")
    Files.writeString(f,
      """[
        |  {"id": 1, "name": "ok"},
        |  {"id": "not-a-number-for-long", "name": 42}
        |]""".stripMargin)
    val df = JsonSource(f.toString).fetch(spark)
    assert(df.count() === 2) // no exception — permissive mode
  }

  test("PERMISSIVE CSV nulls unparseable fields instead of failing (A2)") {
    val dir = Files.createTempDirectory("graft-perm-csv")
    val f = dir.resolve("data.csv")
    Files.writeString(f,
      """id,ts
        |1,2024-01-02
        |oops,also-not-a-date
        |3,2024-01-04
        |""".stripMargin)
    val df = CsvSource(f.toString).fetch(spark)
    assert(df.count() === 3)
  }
}
