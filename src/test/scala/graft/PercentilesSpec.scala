package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Percentiles

/** The distributed-rank exact-percentile operator must be BIT-EQUAL to the
  * `percentile()` aggregate it replaces (same sorted-rank interpolation,
  * same IEEE operation order) — on duplicates, single-element groups,
  * boundary fractions (0 and 1), nulls, and an all-null group.
  */
class PercentilesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("distributed exact percentiles are bit-equal to the percentile() aggregate") {
    val rows: Seq[(String, java.lang.Double)] =
      (0 until 5000).map { i =>
        val g = s"g${i % 7}"
        // deterministic spread with duplicates (mod collisions)
        val v: java.lang.Double = ((i * 2654435761L) % 100000L).toDouble / 100.0
        (g, v)
      } ++ Seq(
        ("solo", java.lang.Double.valueOf(42.0)),   // n = 1: pos = 0 for all p
        ("withnull", java.lang.Double.valueOf(1.0)),
        ("withnull", null),                          // null excluded from ranks
        ("withnull", java.lang.Double.valueOf(3.0)),
        ("allnull", null),                           // group emits null percentiles
        (null, java.lang.Double.valueOf(5.0)),       // NULL is an ordinary group
        (null, java.lang.Double.valueOf(7.0)),       // to percentile() — the
        (null, java.lang.Double.valueOf(9.0)))       // operator must agree
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.5, 0.9, 0.99, 1.0)

    def toMapByGroup(rows: Array[org.apache.spark.sql.Row]) =
      rows.map { r =>
        r.getString(0) ->
          ((1 to 5).map(i => Option(r.get(i)).map(_.asInstanceOf[Double])),
            r.getLong(6))
      }.toMap

    val mine = toMapByGroup(
      Percentiles.exactPercentiles(df, "g", "v", ps).collect())
    val agg = toMapByGroup(
      df.groupBy(col("g")).agg(
          expr("percentile(v, 0.0)"), expr("percentile(v, 0.5)"),
          expr("percentile(v, 0.9)"), expr("percentile(v, 0.99)"),
          expr("percentile(v, 1.0)"), count(lit(1)))
        .collect())

    assert(mine.keySet === agg.keySet)
    agg.foreach { case (g, expected) =>
      assert(mine(g) === expected, s"group $g")
    }
  }

  test("distributed weighted quantiles match the sequential cumulative-weight definition exactly") {
    // duplicates, a 1-row group, threshold-on-boundary runs, a null group —
    // and enough rows that the range exchange actually splits groups
    val rows: Seq[(String, Long, Long)] =
      (0 until 6000).map { i =>
        (s"g${i % 5}", (i * 2654435761L) % 1000L, 1L + (i * 40503L) % 97L)
      } ++ Seq(
        ("solo", 7L, 3L),
        ("dup", 5L, 2L), ("dup", 5L, 2L), ("dup", 9L, 4L), // cw hits tw/2 inside the 5-run
        (null, 1L, 1L), (null, 2L, 1L))                    // null is an ordinary group
    val df = rows.toDF("g", "v", "w")
    val fs = Seq(("p0", 0L, 1L), ("p25", 1L, 4L), ("p50", 1L, 2L),
      ("p75", 3L, 4L), ("p100", 1L, 1L))

    val out = Percentiles.exactWeightedQuantiles(df, "g", "v", "w", fs)
    val mine = out.collect().map { r =>
      r.getString(0) -> ((1 to 5).map(r.getLong), r.getLong(6))
    }.toMap

    // independent oracle: per group, sort by value, scan the cumsum
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(t => (t._2, t._3)).sortBy(_._1)
      val tw = sorted.map(_._2).sum
      val qs = fs.map { case (_, num, den) =>
        var cw = 0L
        sorted.find { case (_, w) => cw += w; cw * den >= tw * num }.get._1
      }
      g -> ((qs, tw))
    }
    assert(mine.keySet === expected.keySet)
    expected.foreach { case (g, e) => assert(mine(g) === e, s"group $g") }

    // the scale contract (round-16 shape): the corpus range exchange +
    // sort + streaming cumsum ran exactly ONCE, inside the scaffold's
    // eager materialization — every downstream branch reads the
    // materialized frame (Scan ExistingRDD), and NO range exchange (and
    // hence no second corpus sort) survives into the final plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan.take(2000))
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"corpus range exchange must happen inside the one-shot materialization, not replay downstream:\n${plan.take(2000)}")
  }

  test("runtime: q121's offset and probe branches read ONE materialized ranked frame (no corpus re-derivation)") {
    // pre-round-16 shape: the offset branch re-ran the within-partition
    // sort + streaming pass on the AQE-reused shuffle output (the old pin
    // asserted the ReusedExchange). Round-16 materializes the ranked
    // frame once, so the executed plan must read it as Scan ExistingRDD
    // and contain NO FileScan at all — the parquet scan, range exchange
    // and sort all live inside the single eager materialization job
    // (q121's own presentation orderBy adds a tiny G-row range exchange,
    // which is why this pin is FileScan-based, not exchange-based)
    val q121 = SparkEntry.queries("q121_weighted_median")(spark, sfDir)
    q121.collect()
    val plan = q121.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    assert(finalPlan.contains("ExistingRDD"),
      s"q121 must read the materialized ranked frame:\n${finalPlan.take(6000)}")
    assert(!finalPlan.contains("FileScan"),
      s"q121's final plan must not re-derive the ranked corpus from parquet:\n${finalPlan.take(6000)}")
  }
}
