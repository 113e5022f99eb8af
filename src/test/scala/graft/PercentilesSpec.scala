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
}
