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

  test("approx_percentile is within 2.5% of exact percentiles (in-query bound)") {
    // within_bounds is computed inside the query (|approx−exact| ≤ 2.5%·exact
    // per percentile); the oracle gate expects literal TRUE — assert the
    // same here so a bound break fails fast with the offending group
    val rows = SparkEntry.queries("q69_approx_percentiles")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bounds"), s"group ${r.getString(0)}")
    }
  }

  test("approx_count_distinct is within 5% of exact (B8, in-query bound)") {
    val rows = SparkEntry.queries("q11_agg_approx_distinct")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bounds"), s"group ${r.getString(0)}")
    }
  }
}
