package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RetrievalQueries

class RetrievalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q143: index totals reconcile with the raw token stream") {
    val idx = RetrievalQueries.q143InvertedIndex(spark, sfDir)
    val byIndex = idx.agg(sum("total_tf")).as[Long].head()
    val byScan = Tables.documents(spark, sfDir)
      .select(size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(byIndex === byScan, "sum of term frequencies must equal corpus token count")
    // df counts distinct docs, so df <= total_tf and df >= 1
    assert(idx.filter(col("df") < 1 || col("df") > col("total_tf")).count() === 0)
  }

  test("q144: ranked output is deterministic and respects the score order") {
    val a = RetrievalQueries.q144Bm25Search(spark, sfDir).collect()
    val b = RetrievalQueries.q144Bm25Search(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq, "same corpus must produce identical ranking")
    assert(a.nonEmpty && a.length <= 20)
    val scores = a.map(_.getAs[Long]("score_scaled")).toSeq
    assert(scores === scores.sorted.reverse, "scores must be non-increasing")
    assert(a.forall(r => (1L to 3L).contains(r.getAs[Long]("n_terms_matched"))))
  }
}
