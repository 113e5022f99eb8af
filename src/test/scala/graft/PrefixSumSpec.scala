package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PrefixSum

/** The distributed two-pass prefix sum must equal the window cumsum it
  * replaces — on duplicates in the sort key, descending order, null
  * values (contribute 0), a null partition key, and extra payload
  * columns riding through — while range-partitioning the corpus instead
  * of hash-partitioning it on the (low-cardinality) group key.
  */
class PrefixSumSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("runningTotal equals the window cumulative sum exactly") {
    val rows: Seq[(String, Long, java.lang.Long, String)] =
      (0 until 5000).map { i =>
        (s"g${i % 3}", (i * 2654435761L) % 500L,
          java.lang.Long.valueOf(1L + (i * 40503L) % 97L), s"payload$i")
      } ++ Seq(
        ("g0", 7L, null, "nullval"),        // null value contributes 0
        (null, 1L, java.lang.Long.valueOf(5L), "ng1"),
        (null, 2L, java.lang.Long.valueOf(6L), "ng2"))
    // unique sort tie-break (id) so the expected window is deterministic
    val df = rows.zipWithIndex
      .map { case ((g, s, w, pay), id) => (g, s, w, pay, id.toLong) }
      .toDF("g", "s", "w", "payload", "id")

    val mine = PrefixSum
      .runningTotal(df, Seq("g"), Seq(col("s").desc, col("id")), "w", "cum")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getLong(r.fieldIndex("id"))) ->
        (r.getLong(r.fieldIndex("cum")), r.getAs[String]("payload")))
      .toMap

    val win = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum", coalesce(sum(col("w")).over(win), lit(0L)))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getLong(r.fieldIndex("id"))) ->
        (r.getLong(r.fieldIndex("cum")), r.getAs[String]("payload")))
      .toMap

    assert(mine === expected)
  }

  test("the corpus is range-partitioned, never hash-partitioned on the group key") {
    val df = (0 until 1000)
      .map(i => (s"g${i % 2}", i.toLong, 1L)).toDF("g", "s", "w")
    val out = PrefixSum.runningTotal(df, Seq("g"), Seq(col("s")), "w", "cum")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
    // the only hash exchange on the group key alone is the tiny P·G
    // offsets frame (its subtree aggregates __pid/__gkey) — the CORPUS
    // never hash-exchanges on g: no hashpartitioning(g#...)
    assert("hashpartitioning\\(g#\\d+".r.findFirstIn(plan).isEmpty, plan.take(4000))
    // and the offset branch must REUSE the corpus range-exchange stage at
    // runtime (AQE stage cache) — the twice-materialized static subtree
    // would otherwise double the corpus scan+shuffle cost
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    assert(
      "ReusedExchange \\[[^\\]]*\\], Exchange rangepartitioning".r
        .findFirstIn(finalPlan).isDefined,
      s"executed plan must reuse the range exchange:\n${finalPlan.take(6000)}")
  }

  test("runningMin equals the exclusive window cumulative min exactly") {
    val rows: Seq[(String, Long, java.lang.Long, String)] =
      (0 until 5000).map { i =>
        (s"g${i % 3}", (i * 2654435761L) % 500L,
          java.lang.Long.valueOf((i * 40503L) % 97L - 50L), s"payload$i")
      } ++ Seq(
        ("g0", 7L, null, "nullval"),        // null value contributes nothing
        ("g9", 1L, null, "onlynull"),       // group whose first value is null
        (null, 1L, java.lang.Long.valueOf(5L), "ng1"),
        (null, 2L, java.lang.Long.valueOf(6L), "ng2"))
    val df = rows.zipWithIndex
      .map { case ((g, s, w, pay), id) => (g, s, w, pay, id.toLong) }
      .toDF("g", "s", "w", "payload", "id")

    val mine = PrefixSum
      .runningMin(df, Seq("g"), Seq(col("s").desc, col("id")), "w", "m")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getLong(r.fieldIndex("id"))) ->
        r.getAs[java.lang.Long]("m"))
      .toMap

    val win = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("m", min(col("w")).over(win))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getLong(r.fieldIndex("id"))) ->
        r.getAs[java.lang.Long]("m"))
      .toMap

    assert(mine === expected)
  }

  test("runningMin range-partitions and reuses the exchange like runningTotal") {
    val df = (0 until 1000)
      .map(i => (s"g${i % 2}", i.toLong, (i * 7L) % 31L)).toDF("g", "s", "w")
    val out = PrefixSum.runningMin(df, Seq("g"), Seq(col("s")), "w", "m")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
    assert("hashpartitioning\\(g#\\d+".r.findFirstIn(plan).isEmpty, plan.take(4000))
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    assert(
      "ReusedExchange \\[[^\\]]*\\], Exchange rangepartitioning".r
        .findFirstIn(finalPlan).isDefined,
      s"executed plan must reuse the range exchange:\n${finalPlan.take(6000)}")
  }

  test("q146 skyline: no point dominates another; dominated points are absent") {
    val sky = SparkEntry.queries("q146_skyline")(spark, sfDir)
      .as[(Long, Long)].collect()
    // frontier is strictly decreasing in day as price increases
    sky.sliding(2).foreach {
      case Array((p1, d1), (p2, d2)) =>
        assert(p1 < p2 || (p1 == p2 && d1 < d2))
        assert(d2 < d1, s"($p2,$d2) is dominated by ($p1,$d1) yet kept")
      case _ =>
    }
    // brute-force check against the raw points
    val pts = Tables.orders(spark, sfDir)
      .select((graft.queries.Exact.dec2(col("o_totalprice")) * 100).cast("long"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
      .distinct().as[(Long, Long)].collect()
    val brute = pts.filter { case (p, d) =>
      !pts.exists { case (p2, d2) =>
        (p2 <= p && d2 <= d) && (p2 < p || d2 < d)
      }
    }.sorted
    assert(sky.toSeq.sorted === brute.toSeq)
  }

  test("orderedRuns equals the windowed-lag run census exactly " +
    "(round-15 q369 internals)") {
    // adversarial layout: few distinct values (long runs), nulls mixed in
    // (null never starts or ends a transition), and enough rows that the
    // range partitioner produces many partition boundaries to stitch
    val rows: Seq[(Long, String)] = (0 until 20000).map { i =>
      val v = (i / 17) % 5 match {
        case 0 => null
        case k => s"v$k"
      }
      (i.toLong, v)
    }
    val df = rows.toDF("k", "v")
    val mine = PrefixSum.orderedRuns(df, Seq(col("k").asc), "v")
      .collect().head
    val w = Window.orderBy(col("k"))
    val exp = df.withColumn("pv", lag(col("v"), 1).over(w))
      .agg(count(lit(1)).as("n"),
        (sum(when(col("pv").isNotNull && col("v") =!= col("pv"), 1L)
          .otherwise(0L)) + 1L).as("runs"))
      .collect().head
    assert(mine.getLong(mine.fieldIndex("n")) === exp.getLong(exp.fieldIndex("n")))
    assert(mine.getLong(mine.fieldIndex("runs")) === exp.getLong(exp.fieldIndex("runs")))
    // and the corpus pass is range-partitioned with a single exchange —
    // no rank self-join, no corpus hash exchange
    val out = PrefixSum.orderedRuns(df, Seq(col("k").asc), "v")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
    assert("hashpartitioning\\(k#\\d+".r.findFirstIn(plan).isEmpty, plan.take(4000))
  }

  test("q128's executed plan reuses the range-exchange stage end-to-end") {
    // same assertion against the real registered query (the Pareto/ABC
    // running revenue share), whose plan wraps runningTotal in joins and
    // a final sort — reuse must survive the full query context
    val df = SparkEntry.queries("q128_pareto_abc")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    assert(
      "ReusedExchange \\[[^\\]]*\\], Exchange rangepartitioning".r
        .findFirstIn(finalPlan).isDefined,
      s"executed q128 plan must reuse the range-exchange stage:\n${finalPlan.take(6000)}")
  }
}
