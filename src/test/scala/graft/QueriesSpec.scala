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

  test("q246: RFM segments partition the users and each dimension's " +
    "marginals are equal-depth quartiles (±1)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q246_rfm_segments")(spark, sfDir)
      .collect()
      .map(r => ((r.getAs[Long]("r_q"), r.getAs[Long]("f_q"),
        r.getAs[Long]("m_q")), r.getAs[Long]("n")))
    val nUsers = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_._2).sum === nUsers)
    Seq[((Long, Long, Long)) => Long](_._1, _._2, _._3).foreach { dim =>
      val marg = rows.groupBy(t => dim(t._1)).view.mapValues(_.map(_._2).sum)
      assert(marg.keys.toSet === Set(0L, 1L, 2L, 3L))
      val depths = marg.values.toSeq
      assert(depths.max - depths.min <= 1, s"quartiles unbalanced: $depths")
    }
  }
}
