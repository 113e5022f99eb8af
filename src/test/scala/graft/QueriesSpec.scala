package graft

import org.scalatest.funsuite.AnyFunSuite

class QueriesSpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("all registered queries execute and return rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows at sf0.001: $empty")
  }

  test("approx_percentile is within 2.5% of exact percentiles") {
    val exact = SparkEntry.queries("q57_percentiles")(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q69_approx_percentiles")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        r.getString(1).split(",").toSeq.map(_.toDouble)).toMap
    approx.foreach { case (prio, aps) =>
      exact(prio).zip(aps).foreach { case (e, a) =>
        // 2.5%: p99 over a few hundred rows per group is inherently noisy
        assert(math.abs(a - e) / e <= 0.025, s"$prio: approx $a vs exact $e")
      }
    }
  }

  test("approx_count_distinct is within 5% of exact (B8)") {
    val rows = SparkEntry.queries("q11_agg_approx_distinct")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
