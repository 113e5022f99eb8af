package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupTopK

class GroupTopKSpec extends AnyFunSuite with SparkSpec {

  private def base = Tables.customer(spark, sfDir)
    .select(col("c_mktsegment"), col("c_custkey"),
      col("c_acctbal").cast(DecimalType(12, 2))
        .cast("double").as("balance")) // same final type as q18/q62

  test("custom GroupTopK operator equals the window formulation") {
    val custom = GroupTopK.topKPerGroup(
        base, Seq("c_mktsegment"), "balance", "c_custkey", 3)
      .orderBy("c_mktsegment", "rn").collect().toSeq
    val window = SparkEntry.queries("q18_topk_pergroup")(spark, sfDir)
      .collect().toSeq
    assert(custom === window)
  }

  test("GroupTopK plans one exchange and NO sort") {
    val df = GroupTopK.topKPerGroup(
      base, Seq("c_mktsegment"), "balance", "c_custkey", 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK "), plan) // exec node prints without the Exec suffix
    assert(!plan.contains("Sort "), s"heap operator must not sort:\n$plan")
  }

  test("GroupTopK over-budget fallback (spillable sort) is result-identical") {
    // force the fallback: a high-cardinality key (every customer its own
    // group) with a tiny in-memory budget
    spark.conf.set("spark.graft.topk.maxRowsInMemory", "8")
    try {
      val perCust = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("double").as("balance"))
      val custom = GroupTopK.topKPerGroup(
          perCust, Seq("c_custkey"), "balance", "c_mktsegment", 1)
        .orderBy("c_custkey").collect().toSeq
      val n = Tables.customer(spark, sfDir).count()
      assert(custom.size === n, "one row per group expected")
      assert(custom.forall(_.getInt(3) == 1))
      // and the grouped shape still matches the window formulation
      val seg = GroupTopK.topKPerGroup(
          base, Seq("c_mktsegment"), "balance", "c_custkey", 3)
        .orderBy("c_mktsegment", "rn").collect().toSeq
      val window = SparkEntry.queries("q18_topk_pergroup")(spark, sfDir)
        .collect().toSeq
      assert(seg === window)
    } finally spark.conf.unset("spark.graft.topk.maxRowsInMemory")
  }

  test("GroupTopK handles k larger than any group") {
    val n = base.count()
    val all = GroupTopK.topKPerGroup(
      base, Seq("c_mktsegment"), "balance", "c_custkey", n.toInt + 10)
    assert(all.count() === n)
  }
}
