package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fingerprint: equal texts equal, order-sensitive, stable across runs") {
    val df = Seq(
      "alpha beta gamma",
      "alpha beta gamma",
      "gamma beta alpha").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2), "fingerprint must be order-sensitive")
    val again = df.select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    assert(fps.toSeq === again.toSeq)
  }

  test("fingerprint stays in [0, 2^31-1) — no overflow under ANSI mode") {
    val fps = Tables.documents(spark, sfDir)
      .select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("tokenizer trims and splits on whitespace runs") {
    val df = Seq("  a  b c ").toDF("text")
    assert(df.select(TextFunctions.tokens(col("text"))).as[Seq[String]].head()
      === Seq("a", "b", "c"))
  }

  test("quality score stays in [0,1]") {
    val qs = Tables.documents(spark, sfDir)
      .select(TextFunctions.qualityScore(col("text"))).as[Double].collect()
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId always returns a profiled language") {
    val langs = TextFunctions.langProfiles.map(_._1).toSet
    val preds = Tables.documents(spark, sfDir)
      .select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(preds.forall(langs.contains))
  }
}
