package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Tier-B relational operator queries (SURVEY.md §2.B B1–B13).
  *
  * Conventions for DuckDB-oracle exactness (SURVEY.md §5):
  *   - money-like doubles are cast to DECIMAL before aggregation so sums are
  *     exact decimal arithmetic in both engines (no float summation-order
  *     drift);
  *   - averages are computed as cast(sum_decimal as double)/count — a single
  *     IEEE division of identical operands, hence bit-identical;
  *   - every query ends in an orderBy over a unique key (or aggregates to a
  *     low-cardinality, fully-ordered result);
  *   - decimal output columns are cast to a pinned DECIMAL(38,s) in both
  *     engines so logical types line up.
  *
  * Scale posture (100 TB): all plans below are shuffle-minimal — dimension
  * joins are broadcast, aggregations are partial (map-side) by construction,
  * filters/projections sit directly on the parquet scan so pushdown + column
  * pruning apply. Nothing collects to the driver.
  */
object Relational {

  private val D2 = DecimalType(12, 2) // money columns (2-dec doubles)
  private val D1 = DecimalType(5, 2)  // small rates: discount/tax in [0,1)

  private def dec2(c: Column): Column = c.cast(D2)
  private def rate(c: Column): Column = c.cast(D1)
  private val one = lit(1).cast(D1)

  /** B7 hash aggregate — TPC-H Q1-shaped pricing summary.
    * Filter pushed to parquet scan; partial aggregation map-side; 6-row
    * result, so the shuffle is negligible at any scale.
    */
  def q01Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - rate(col("l_discount"))))
          .cast(DecimalType(38, 4)).as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one - rate(col("l_discount")))
            * (one + rate(col("l_tax"))))
          .cast(DecimalType(38, 6)).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))) * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) AS DECIMAL(38,6)) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
