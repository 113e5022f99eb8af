package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q217: OHLC invariants — low <= open, close <= high on every bar; " +
    "bar count equals distinct (event_type, hour) pairs") {
    val bars = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir).cache()
    try {
      val bad = bars.filter(
        col("low") > col("open") || col("low") > col("close") ||
          col("high") < col("open") || col("high") < col("close") ||
          col("n_events") < 1).count()
      assert(bad === 0)
      val distinctBars = Tables.events(spark, sfDir)
        .select(col("event_type"), date_trunc("hour", col("ts"))).distinct().count()
      assert(bars.count() === distinctBars)
    } finally bars.unpersist()
  }

  test("q217: single-event bars have open = high = low = close") {
    val bad = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir)
      .filter(col("n_events") === 1)
      .filter(col("open") =!= col("close") || col("high") =!= col("low") ||
        col("open") =!= col("high")).count()
    assert(bad === 0)
  }

  test("q217: plan is one hash-aggregation — no window operator, no join") {
    val plan = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "OHLC must not use window functions")
    assert(!plan.toLowerCase.contains("join"), "OHLC must not join")
  }

  test("q221: every reported bucket actually violates the 2x seasonal band " +
    "(driver-side recount)") {
    val rows = SparkEntry.queries("q221_seasonal_anomaly")(spark, sfDir)
      .select("event_type", "bar_ts", "n", "total_hod", "n_days", "verdict")
      .collect()
    assert(rows.nonEmpty, "fixture should contain seasonal outliers")
    rows.foreach { r =>
      val (n, tot, d) = (r.getAs[Long]("n"), r.getAs[Long]("total_hod"),
        r.getAs[Long]("n_days"))
      val v = r.getAs[String]("verdict")
      if (v == "high") assert(n * d > tot * 2)
      else { assert(v == "low"); assert(n * d * 2 < tot) }
    }
    // independent recount of one flagged cell's baseline
    val r0 = rows.head
    val ev = Tables.events(spark, sfDir)
    val hodOf = spark.sql(
      s"SELECT hour(TIMESTAMP '${r0.getAs[java.sql.Timestamp]("bar_ts")}')")
      .as[Int].head
    val tot0 = ev.filter(col("event_type") === r0.getAs[String]("event_type"))
      .filter(hour(col("ts")) === hodOf).count()
    assert(tot0 === r0.getAs[Long]("total_hod"))
  }
}
