package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity
import graft.queries.SimilarityQueries

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Offset = SimilarityQueries.PlantOffset

  test("minhash LSH recovers every planted near-dup pair (B15)") {
    val pairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val nDocs = Tables.documents(spark, sfDir).count()
    val planted = (0L until nDocs by 5).map(i => (i, i + Offset)).toSet
    val missed = planted -- pairs
    assert(missed.isEmpty, s"planted pairs missed by LSH: ${missed.take(5)}")
  }

  test("minhash candidates are confirmed by exact Jaccard >= 0.8 (no false positives in output)") {
    val bad = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .filter(col("jaccard") < 0.8).count()
    assert(bad === 0)
  }

  test("md5Hash64 equals the first 8 md5 digest bytes, big-endian") {
    val rows = Seq("hello", "world", "", "zz9end", "a b c")
      .toDF("t")
      .select(col("t"), Similarity.md5Hash64(col("t")).as("h"))
      .collect()
    rows.foreach { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val expect = java.nio.ByteBuffer.wrap(md).getLong // big-endian first 8 bytes
      assert(r.getLong(1) === expect, s"md5Hash64('${r.getString(0)}')")
    }
  }

  test("simhash finds most planted pairs with small hamming distance") {
    val out = SparkEntry.queries("q37_dedup_simhash")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val nDocs = Tables.documents(spark, sfDir).count()
    val planted = (0L until nDocs by 5).map(i => (i, i + Offset)).toSet
    val recall = (planted & out).size.toDouble / planted.size
    assert(recall >= 0.7, s"simhash planted recall $recall < 0.7")
  }

  test("embedding near-dup finds every planted twin with cosine >= 0.99") {
    val out = SparkEntry.queries("q39_embed_neardup")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val nVecs = Tables.embeddings(spark, sfDir).count()
    val planted = (0L until nVecs by 7).map(i => (i, i + Offset)).toSet
    val missed = planted -- out
    assert(missed.isEmpty, s"planted vector twins missed: ${missed.take(5)}")
  }

  test("LSH ANN recall vs brute-force top-5 is useful (B16)") {
    val exact = SparkEntry.queries("q40_cosine_topk")(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val ann = SparkEntry.queries("q41_ann_lsh")(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH ANN recall $recall < 0.3")
  }

  test("IVF ANN recall vs brute-force top-5 is useful (B16)") {
    val exact = SparkEntry.queries("q40_cosine_topk")(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val ivf = SparkEntry.queries("q42_ann_ivf")(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF ANN recall $recall < 0.3")
  }

  test("k-means-trained IVF keeps high recall vs brute-force top-5") {
    // at this corpus size the first-16 init already covers the space, so
    // trained-vs-untrained ordering is noise; the meaningful invariant is
    // that training converges to an index with HIGH absolute recall
    // (untrained sits ~0.9 here — training must not degrade the index)
    val exact = SparkEntry.queries("q40_cosine_topk")(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val trained = SparkEntry.queries("q74_ann_ivf_trained")(spark, sfDir)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val rTrained = (exact & trained).size.toDouble / exact.size
    assert(rTrained >= 0.8, s"trained IVF recall $rTrained < 0.8")
  }

  test("k-means centroids: deterministic, k rows, no empty-cluster nulls") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val c1 = Similarity.kmeansCentroids(emb, 8, 3)
      .orderBy("cid").collect().map(_.toString)
    val c2 = Similarity.kmeansCentroids(emb, 8, 3)
      .orderBy("cid").collect().map(_.toString)
    assert(c1.length === 8)
    assert(c1.toSeq === c2.toSeq, "k-means must be deterministic")
  }

  test("dedup clusters: planted twins share their original's cluster; one canonical each") {
    val rows = SparkEntry.queries("q72_dedup_clusters")(spark, sfDir)
      .select("doc_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect()
    val cluster = rows.map(r => r._1 -> r._2).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    (0L until nDocs by 5).foreach { i =>
      assert(cluster(i + Offset) === cluster(i),
        s"planted twin ${i + Offset} not clustered with $i")
    }
    // exactly one canonical per cluster, and it is the min id
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val canon = members.filter(_._3)
      assert(canon.length === 1, s"cluster $cid has ${canon.length} canonicals")
      assert(canon.head._1 === members.map(_._1).min)
      assert(cid === members.map(_._1).min)
    }
  }

  test("cosine is 1.0 on identical vectors, symmetric on pairs") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))).toDF("a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("c"),
      Similarity.cosine(col("b"), col("a")).as("cr")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).getDouble(0) === 0.0)
    assert(out(0).getDouble(0) === out(0).getDouble(1))
  }

  test("jaccard bounds and identity") {
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
      .toDF("a", "b")
    val vals = df.select(Similarity.jaccard(col("a"), col("b"))).as[Double].collect()
    assert(vals(0) === 1.0 && vals(1) === 0.0)
  }
}
