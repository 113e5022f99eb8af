package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.Skew

/** Scale-machinery correctness: salted joins/aggs must be result-identical
  * to their plain forms, and bucketed tables must co-locate joins (no
  * exchange on the join key).
  */
class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val outCols = Seq("l_orderkey", "l_quantity", "l_linenumber", "o_totalprice")
    val plain = li.join(orders, Seq("l_orderkey"))
      .select(outCols.map(col): _*)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val salted = Skew.saltedJoin(li, orders, Seq("l_orderkey"), 8)
      .select(outCols.map(col): _*)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(salted === plain)
  }

  test("saltedAgg equals the plain aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("s"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedAgg(
      li,
      keys = Seq("l_returnflag"),
      saltFrom = Seq(col("l_orderkey"), col("l_linenumber")),
      saltBuckets = 8,
      partialAggs = Seq(
        sum(col("l_quantity").cast(DecimalType(12, 2))).as("ps"),
        count(lit(1)).as("pn")),
      mergeAggs = Seq(
        sum(col("ps")).cast(DecimalType(22, 2)).as("s"),
        sum(col("pn")).as("n")))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted === plain)
  }

  test("bucketed tables co-locate the join: no exchange on the join key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sfDir)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem").join(
      spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    // force a non-broadcast join so bucketing is what saves the shuffle
    val planned = joined.hint("merge")
    val plan = planned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is still correct
    assert(planned.count() ===
      Tables.lineitem(spark, sfDir).join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count())
  }
}
