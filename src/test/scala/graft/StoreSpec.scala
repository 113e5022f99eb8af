package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EtlPipeline
import graft.sources.ParquetSource
import graft.store.{ParquetStore, Upsert}
import graft.transform.Transforms

class StoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("Upsert replaces matched keys and keeps the rest (A15)") {
    val target = Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("id", "v")
    val staging = Seq((2, "new2"), (4, "new4")).toDF("id", "v")
    val out = Upsert(target, staging, Seq("id"))
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "old1"), (2, "new2"), (3, "old3"), (4, "new4")))
  }

  test("ParquetStore upserts into an existing target path") {
    val dir = Files.createTempDirectory("graft-store").resolve("tgt").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.parquet(dir)
    new ParquetStore(dir, Seq("id")).upsert(Seq((2, "B"), (3, "C")).toDF("id", "v"))
    val out = spark.read.parquet(dir).orderBy("id").as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "a"), (2, "B"), (3, "C")))
  }

  test("ParquetStore creates the target when absent") {
    val dir = Files.createTempDirectory("graft-store").resolve("fresh").toString
    new ParquetStore(dir, Seq("id")).upsert(Seq((1, "a")).toDF("id", "v"))
    assert(spark.read.parquet(dir).count() === 1)
  }

  test("ApplyChangelog keeps only the latest image per key and honors deletes") {
    val target = Seq((1, "t1"), (2, "t2"), (3, "t3")).toDF("id", "v")
    // key 1: insert then update (latest wins); key 2: update then delete
    // (gone, despite the stale update); key 4: plain insert
    val changelog = Seq(
      (1, "new1a", "I", 1), (1, "new1b", "U", 2),
      (2, "stale2", "U", 1), (2, "x", "D", 2),
      (4, "new4", "I", 1)).toDF("id", "v", "op", "seq")
    val out = graft.store.ApplyChangelog(target, changelog, Seq("id"), "seq")
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "new1b"), (3, "t3"), (4, "new4")))
  }

  test("ApplyChangelog seq ties resolve by explicit op priority: D beats U") {
    val target = Seq((1, "t1"), (2, "t2")).toDF("id", "v")
    // both keys have a U and a D at the SAME seq — the delete must win
    // regardless of how the value columns would sort
    val changelog = Seq(
      (1, "zzz", "U", 5), (1, "aaa", "D", 5),
      (2, "aaa", "U", 5), (2, "zzz", "D", 5)).toDF("id", "v", "op", "seq")
    val out = graft.store.ApplyChangelog(target, changelog, Seq("id"), "seq")
      .as[(Int, String)].collect().toSeq
    assert(out.isEmpty)
  }

  test("observe() exposes pipeline metrics without a second pass") {
    import org.apache.spark.sql.functions._
    val observed = Tables.orders(spark, sfDir)
      .observe("etl_metrics",
        count(lit(1)).as("rows_seen"),
        sum(when(col("o_totalprice") > 400000, 1L).otherwise(0L)).as("big_orders"))
      .filter(col("o_totalprice") > 0)
    // the metrics hang off the QueryExecution that ran — use the same DF's
    // action (a write would plan a fresh QueryExecution and leave this one
    // unexecuted)
    observed.collect()
    val metrics = observed.queryExecution.observedMetrics("etl_metrics")
    assert(metrics.getAs[Long]("rows_seen") === 1500L)
    assert(metrics.getAs[Long]("big_orders") > 0L)
  }

  test("ShowStore displays without failing (A20)") {
    new graft.store.ShowStore().upsert(Tables.region(spark, sfDir))
  }

  test("map functions: creation, keys/values, lookup, filter (B13)") {
    import org.apache.spark.sql.functions._
    val df = Seq((1, "a", 10.0), (1, "b", 20.0)).toDF("id", "k", "v")
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("m"))
    val r = df.select(
      sort_array(map_keys(col("m"))).as("ks"),
      element_at(col("m"), "b").as("vb"),
      size(map_filter(col("m"), (_, v) => v > 15.0)).as("nbig"))
      .head()
    assert(r.getSeq[String](0) === Seq("a", "b"))
    assert(r.getDouble(1) === 20.0)
    assert(r.getInt(2) === 1)
  }

  test("EtlPipeline composes fetch -> transform -> store -> post (A21)") {
    val outDir = Files.createTempDirectory("graft-pipe").resolve("out").toString
    val pipeline = new EtlPipeline(
      source = ParquetSource(s"$sfDir/region.parquet"),
      transform = df => Transforms.dedupExact(df),
      store = new ParquetStore(outDir, Seq("r_regionkey")))
    val result = pipeline.run(spark)
    assert(result.count() === 5)
    assert(spark.read.parquet(outDir).count() === 5)
    // run again: upsert of identical keys keeps cardinality stable
    pipeline.run(spark)
    assert(spark.read.parquet(outDir).count() === 5)
  }
}
