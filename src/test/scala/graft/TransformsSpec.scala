package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnMapping, TargetSchema}
import graft.transform.Transforms

class TransformsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dedupExact removes full-row duplicates (A10)") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "v")
    assert(Transforms.dedupExact(df).count() === 2)
  }

  test("dedupKeyed keeps exactly one deterministic survivor per key (B14)") {
    val df = Seq((1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 9, "z"))
      .toDF("k", "ord", "v")
    val out = Transforms.dedupKeyed(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(2))).toSeq === Seq((1, "a"), (2, "z")))
  }

  test("dedupKeyed is deterministic across repeated runs") {
    val df = Tables.lineitem(spark, sfDir)
    def run() = Transforms.dedupKeyed(df, Seq("l_orderkey"),
      Seq(col("l_linenumber"), col("l_partkey")))
      .orderBy("l_orderkey").collect().toSeq
    assert(run() === run())
  }

  test("scd2Historize collapses unchanged runs into versioned intervals") {
    val df = Seq(
      (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "A"),
      (2, 1, "X")).toDF("k", "t", "attr")
    val out = Transforms.scd2Historize(df, Seq("k"), Seq("attr"), "t")
      .orderBy("k", "version").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        Option(r.get(3)), r.getBoolean(4), r.getInt(5))).toSeq
    assert(out === Seq(
      (1, "A", 1, Some(3), false, 1),  // t=2 repeat collapsed
      (1, "B", 3, Some(4), false, 2),
      (1, "A", 4, None, true, 3),      // re-appearance opens a NEW version
      (2, "X", 1, None, true, 1)))
  }

  test("scd2Historize null-safe compare: null→value and value→null are changes") {
    val df = Seq((1, 1, Option.empty[String]), (1, 2, Some("A")),
      (1, 3, Option.empty[String]), (1, 4, Option.empty[String]))
      .toDF("k", "t", "attr")
    val versions = Transforms.scd2Historize(df, Seq("k"), Seq("attr"), "t")
      .orderBy("version").collect()
      .map(r => (Option(r.getString(1)), r.getInt(2))).toSeq
    assert(versions === Seq((None, 1), (Some("A"), 2), (None, 3)))
  }

  test("mapColumnsToTarget renames and casts in one projection (A11)") {
    val df = Seq(("7", "2024-01-02", "3.5", "true")).toDF("a", "b", "c", "d")
    val out = Transforms.mapColumnsToTarget(df, TargetSchema(Seq(
      ColumnMapping("n", "a", "integer"),
      ColumnMapping("day", "b", "date", Some("yyyy-MM-dd")),
      ColumnMapping("x", "c", "float"),
      ColumnMapping("flag", "d", "boolean"))))
    assert(out.schema.map(f => (f.name, f.dataType)) === Seq(
      ("n", IntegerType), ("day", DateType), ("x", FloatType), ("flag", BooleanType)))
    val r = out.head()
    assert(r.getInt(0) === 7)
    assert(r.getDate(1).toString === "2024-01-02")
    assert(r.getFloat(2) === 3.5f)
    assert(r.getBoolean(3))
  }

  test("mapColumnsToTarget parses timestamps with custom format (A13)") {
    val df = Seq(("02/01/2024 13:45:00")).toDF("t")
    val out = Transforms.mapColumnsToTarget(df, TargetSchema(Seq(
      ColumnMapping("ts", "t", "timestamp", Some("dd/MM/yyyy HH:mm:ss")))))
    assert(out.head().getTimestamp(0).toString === "2024-01-02 13:45:00.0")
  }

  test("mapColumnsToTarget rejects unsupported types like the reference") {
    val df = Seq((1)).toDF("a")
    val e = intercept[IllegalArgumentException] {
      Transforms.mapColumnsToTarget(df, TargetSchema(Seq(
        ColumnMapping("a", "a", "uuid"))))
    }
    assert(e.getMessage.contains("Unsupported data type"))
  }

  test("aes encrypt/decrypt roundtrip is identity (A19)") {
    val key = lit("0123456789abcdef0123456789abcdef")
    val df = Seq(("secret-1"), ("secret-2")).toDF("v")
    val out = df.select(
      Transforms.aesDecryptCol(Transforms.aesEncryptCol(col("v"), key), key).as("rt"))
    assert(out.as[String].collect().toSeq === Seq("secret-1", "secret-2"))
  }

  test("QualityChecks passes (violations=0) on EMPTY input, not null") {
    import graft.transform.QualityChecks.{inSet, notNull}
    val empty = Seq.empty[(Long, String)].toDF("k", "s")
    val rows = graft.transform.QualityChecks
      .run(empty, Seq(notNull("k"), inSet("s", Seq("a"))))
      .select("check_name", "total", "violations", "passed")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rows.map(_._2).forall(_ === 0L))
    assert(rows.map(_._3).forall(_ === 0L), "violations must be 0, not null")
    assert(rows.map(_._4).forall(identity), "passed must be true on empty input")
  }

  test("q255: CDC compaction applies last-writer-wins with tombstones — " +
    "deletes win over updates on keys hit by both") {
    import org.apache.spark.sql.functions._
    val snap = SparkEntry.queries("q255_cdc_compaction")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[String]("last_op"), r.getAs[String]("status")))
      .toMap
    val orig = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every %7 key (including %35 = also-updated) is gone
    assert(orig.keys.filter(_ % 7 == 0).forall(!snap.contains(_)),
      "tombstoned keys must not survive")
    orig.foreach { case (k, st) =>
      if (k % 7 != 0) {
        val (op, status) = snap(k)
        if (k % 5 == 0) { assert(op === "U" && status === "U", s"key $k") }
        else { assert(op === "I" && status === st, s"key $k") }
      }
    }
    assert(snap.size === orig.size - orig.keys.count(_ % 7 == 0))
  }
}
