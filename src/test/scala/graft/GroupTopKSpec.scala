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

  test("GroupTopK plans partial → exchange → final, and NO sort") {
    val df = GroupTopK.topKPerGroup(
      base, Seq("c_mktsegment"), "balance", "c_custkey", 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK "), plan) // exec node prints without the Exec suffix
    // the map-side combiner must sit BELOW the key exchange so the shuffle
    // carries at most k rows per key per mapper
    assert(plan.contains("GroupTopKPartial"), plan)
    val iPartial = plan.indexOf("GroupTopKPartial")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    assert(iExchange >= 0 && iExchange < iPartial,
      s"partial must be under the exchange:\n$plan")
    assert(!plan.contains("Sort "), s"heap operator must not sort:\n$plan")
  }

  test("partial top-k prunes the shuffle to at most k rows per key per partition") {
    import spark.implicits._
    // 4 input partitions × 2 keys × k=2 → partial emits ≤ 16 rows of 4000
    val df = (1 to 4000).map(i => (i % 2, i)).toDF("key", "v").repartition(4)
    val topk = GroupTopK.topKPerGroup(df, Seq("key"), "v", "v", 2)
    val expected = Seq((0, 4000, 1), (0, 3998, 2), (1, 3999, 1), (1, 3997, 2))
    assert(topk.select("key", "v", "rn").as[(Int, Int, Int)].collect().toSet
      === expected.toSet)
    // the pruned pre-shuffle frame is the partial exec's own output:
    // execute just that subtree and count what would cross the wire
    // (unwrap AQE — collect() does not traverse into AdaptiveSparkPlanExec)
    val physical = topk.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val partialPlan = physical.collect {
      case p: graft.plans.GroupTopKPartialExec => p
    }
    assert(partialPlan.nonEmpty, "partial exec missing from the plan")
    val shuffled = partialPlan.head.execute().count()
    assert(shuffled <= 16L, s"partial must prune the shuffle, shipped $shuffled rows")
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
