package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Invariant tests for the corpus-composition operators (q202/q203). The
  * DuckDB oracle gates bit-exactness of the estimator arithmetic; these
  * pin the semantic claims the plant makes checkable — which source pairs
  * overlap, how the sketch estimate relates to the exact Jaccard, and who
  * wins the priority resolution.
  */
class CorpusSpec extends AnyFunSuite with SparkSpec {

  private def ringAdjacent(a: String, b: String): Boolean = {
    val (x, y) = (a.drop(3).toInt, b.drop(3).toInt)
    (y - x + 20) % 20 == 1 || (x - y + 20) % 20 == 1
  }

  test("q202: exactly the ring-adjacent source pairs overlap") {
    val rows = CorpusQueries.q202SourceOverlapSketch(spark, sfDir).collect()
    assert(rows.length === 190) // C(20, 2) pairs, every one reported
    rows.foreach { r =>
      val adj = ringAdjacent(r.getAs[String]("source_a"),
        r.getAs[String]("source_b"))
      val both = r.getAs[Long]("n_both")
      assert(both > 0 === adj,
        s"${r.getAs[String]("source_a")}–${r.getAs[String]("source_b")}: " +
          s"n_both=$both adj=$adj")
      assert(r.getAs[Long]("k_merged") <= 64)
      assert(r.getAs[Long]("est_jaccard_ppm") <= 1000000L)
    }
  }

  test("q202: when the sketch holds the whole union the estimate IS the " +
    "exact Jaccard (sub-k sources at sf0.001)") {
    // at sf0.001 each source has ≤ ~45 distinct docs, so every pairwise
    // union fits in k=64 and the bottom-k estimate must equal the exact
    // Jaccard of the fingerprint sets
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .collect()
    val base = docs.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[String]("h")).toSet).toMap
    val planted = docs.filter(_.getAs[Long]("doc_id") % 3 == 0)
      .groupBy(r => s"src${(r.getAs[String]("source").drop(3).toInt + 1) % 20}")
      .view.mapValues(_.map(_.getAs[String]("h")).toSet).toMap
    val sets = base.map { case (s, hs) =>
      s -> (hs ++ planted.getOrElse(s, Set.empty)) }
    val rows = CorpusQueries.q202SourceOverlapSketch(spark, sfDir).collect()
    rows.foreach { r =>
      val a = sets(r.getAs[String]("source_a"))
      val b = sets(r.getAs[String]("source_b"))
      if ((a ++ b).size <= 64) {
        val exactPpm = (a & b).size.toLong * 1000000L / (a ++ b).size
        assert(r.getAs[Long]("est_jaccard_ppm") === exactPpm)
        assert(r.getAs[Long]("k_merged") === (a ++ b).size.toLong)
      }
    }
  }

  test("q203: every planted twin is charged exactly once, to the " +
    "priority-ordered winner") {
    val out = CorpusQueries.q203CrossSourcePriority(spark, sfDir).collect()
    val nTwins = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0).count()
    assert(out.map(_.getAs[Long]("n_dropped")).sum === nTwins)
    out.foreach { r =>
      val kept = r.getAs[String]("source_kept").drop(3).toInt
      val dropped = r.getAs[String]("source_dropped").drop(3).toInt
      // the winner always holds the strictly smaller priority number;
      // on the ring that means kept = dropped's predecessor — except at
      // the src19→src0 wraparound, where the PLANTED copy (src0) beats
      // the original (src19)
      assert(kept < dropped)
      assert((dropped - kept + 20) % 20 == 1 || (kept == 0 && dropped == 19))
    }
    // the wraparound row proves priority (not originality) decides
    assert(out.exists(r => r.getAs[String]("source_kept") == "src0" &&
      r.getAs[String]("source_dropped") == "src19"))
  }

  test("q205: every planted loop flags with a run >= 4; the natural corpus " +
    "has no tandem runs at all") {
    val rows = CorpusQueries.q205TandemRepeats(spark, sfDir).collect()
    val (planted, natural) = rows.partition(
      _.getAs[Long]("doc_id") >= CorpusQueries.LoopPlantOffset)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      // four planted copies of the doc's own 5-token prefix, followed by
      // the original text whose first chunk IS that prefix → run of 5
      assert(r.getAs[Long]("max_run") >= 4,
        s"planted doc ${r.getAs[Long]("doc_id")} max_run=" +
          r.getAs[Long]("max_run"))
      assert(r.getAs[Long]("n_tandem_runs") >= 1)
      assert(r.getAs[Long]("tandem_ppm") > 0)
    }
    natural.foreach { r =>
      assert(r.getAs[Long]("max_run") === 1L,
        s"natural doc ${r.getAs[Long]("doc_id")} has a tandem run")
      assert(r.getAs[Long]("tandem_ppm") === 0L)
    }
  }

  test("q202/q203 scale shape: no corpus-sized cross products; the corpus " +
    "is scanned once per operator input") {
    val q202 = CorpusQueries.q202SourceOverlapSketch(spark, sfDir)
    q202.collect()
    val plan202 = q202.queryExecution.executedPlan.toString
    // the only cartesian is the #sources² pair frame (registry-sized);
    // corpus rows never meet a nested-loop join
    assert(!plan202.contains("BroadcastNestedLoopJoin"))
    val q203 = CorpusQueries.q203CrossSourcePriority(spark, sfDir)
    q203.collect()
    val plan203 = q203.queryExecution.executedPlan.toString
    assert(!plan203.contains("CartesianProduct") &&
      !plan203.contains("BroadcastNestedLoopJoin"))
  }
}
