package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Remaining DataFrame/Dataset API surface: pivot, null handling
  * (DataFrameNaFunctions), typed Dataset operations.
  */
object ApiSurfaceQueries {
  import Exact._

  /** Pivot: order counts and totals per priority × status. Explicit pivot
    * values keep the plan single-pass (no distinct-values pre-query) —
    * the required form at scale. The oracle is portable conditional
    * aggregation.
    */
  def q65Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  val q65Oracle: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** DataFrameNaFunctions: synthesize nulls (nullif), then fill one column
    * and drop rows where another stayed null — the ETL cleaning trio.
    */
  def q66NaHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("segment"),
        when(col("c_acctbal") > 5000, col("c_acctbal")).as("big_bal"))
      .na.fill(Map("segment" -> "UNKNOWN"))
      .na.drop(Seq("big_bal"))
      .select(col("c_custkey"), col("segment"),
        money(col("big_bal")).as("big_bal"))
      .orderBy(col("c_custkey"))

  val q66Oracle: String =
    """SELECT c_custkey,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS segment,
      |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS big_bal
      |FROM customer
      |WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin

  case class OrderRow(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double)
  case class StatusStats(status: String, n: Long, total_cents: Long)

  /** Typed Dataset surface: as[T] → filter → groupByKey → mapGroups with
    * compile-time row types. Money is carried as exact integer cents inside
    * the typed code so the oracle comparison stays exact.
    */
  def q67TypedOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .as[OrderRow]
      .filter(_.o_totalprice > 100000.0)
      .groupByKey(_.o_orderstatus)
      .mapGroups { (status, rows) =>
        var n = 0L
        var cents = 0L
        rows.foreach { r =>
          n += 1
          cents += math.round(r.o_totalprice * 100)
        }
        StatusStats(status, n, cents)
      }
      .toDF()
      .orderBy(col("status"))
  }

  val q67Oracle: String =
    """SELECT o_orderstatus AS status, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |WHERE o_totalprice > 100000
      |GROUP BY o_orderstatus
      |ORDER BY status""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_pivot"       -> (q65Pivot _),
    "q66_na_handling" -> (q66NaHandling _),
    "q67_typed_ops"   -> (q67TypedOps _))

  val oracles: Map[String, String] = Map(
    "q65_pivot"       -> q65Oracle,
    "q66_na_handling" -> q66Oracle,
    "q67_typed_ops"   -> q67Oracle)
}
