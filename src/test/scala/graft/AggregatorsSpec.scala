package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.multimodal.Multimodal

class AggregatorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("WelfordVariance matches built-in var_samp (B19)") {
    val df = Tables.orders(spark, sfDir).select(col("o_totalprice").as("x"))
    val welford = udaf(Aggregators.WelfordVariance)
    val r = df.agg(
      welford(col("x")).as("w"),
      var_samp(col("x")).as("v")).head()
    val (w, v) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(w - v) / v < 1e-9, s"welford $w vs var_samp $v")
  }

  test("VecAvg centroid of identical vectors is that vector") {
    val df = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(1.0, 2.0)).toDF("v")
    val vecAvg = udaf(Aggregators.VecAvg)
    assert(df.agg(vecAvg(col("v"))).as[Seq[Double]].head() === Seq(1.0, 2.0))
  }

  test("multimodal stub decode is deterministic and schema-stable") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sfDir))
      .as[Multimodal.MediaRow]
    val a = Multimodal.extractFeatures(media).orderBy("doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(media).orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.forall(f => f.width >= 64 && f.n_frames >= 1))
  }
}
