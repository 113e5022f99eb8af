package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{MinHashSignature, SimHash64}
import graft.functions.{Similarity, TextFunctions}

/** Native codegen'd expressions must be semantically identical to their
  * declarative (higher-order-function) formulations — same results, just
  * ~100× cheaper.
  */
class ExpressionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tokenHashes = Tables.documents(spark, sfDir)
    .limit(50)
    .select(col("doc_id"),
      transform(TextFunctions.tokens(col("text")), t => xxhash64(t)).as("th"))

  test("ShingleStrings occurrence mode keeps duplicates in window order; distinct mode dedups") {
    val docs = Seq(
      (1L, "a b a b a"),    // duplicate bigrams
      (2L, "x"),            // shorter than k → whole text as one window
      (3L, "p q r")).toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
        graft.expressions.ShingleStrings
          .shingleOccurrences(TextFunctions.tokens(col("text")), 2).as("occ"),
        graft.expressions.ShingleStrings
          .shingleStrings(TextFunctions.tokens(col("text")), 2).as("dis"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getSeq[String](2)))).toMap
    assert(both(1L)._1 === Seq("a b", "b a", "a b", "b a"))
    assert(both(1L)._2 === Seq("a b", "b a"))
    assert(both(2L)._1 === Seq("x") && both(2L)._2 === Seq("x"))
    assert(both(3L)._1 === Seq("p q", "q r") && both(3L)._2 === Seq("p q", "q r"))
  }

  test("MaxTokenCount equals the declarative explode+count+max, incl. edge rows") {
    val docs = Seq(
      (1L, "a b a b a"),   // max multiplicity 3
      (2L, "x"),           // single token → 1
      (3L, ""),            // tokens('') = [''] → 1
      (4L, "p p p p"),     // all same → 4
      (5L, "u v w")        // all distinct → 1
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val native = docs.select(col("doc_id"),
      graft.expressions.MaxTokenCount.maxTokenCount(col("toks")).as("m"))
      .as[(Long, Int)].collect().toMap
    assert(native === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 4, 5L -> 1))
    // and on real corpus rows, ≡ the relational formulation
    val corpus = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val viaExpr = corpus.select(col("doc_id"),
      graft.expressions.MaxTokenCount.maxTokenCount(col("toks")).as("m"))
      .as[(Long, Int)].collect().toMap
    val viaAgg = corpus.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(max("count").as("m"))
      .as[(Long, Long)].collect().map { case (k, v) => k -> v.toInt }.toMap
    assert(viaExpr === viaAgg)
  }

  test("InterleaveBits equals the reference Morton encoding (incl. negatives)") {
    def morton(x: Int, y: Int): Long = {
      var z = 0L
      var i = 0
      while (i < 32) {
        z |= ((x >>> i) & 1L) << (2 * i)
        z |= ((y >>> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 1),
      (Int.MaxValue, Int.MinValue), (-1, -1), (123456789, 987654321))
    val rows = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.expressions.InterleaveBits.zorder64(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === morton(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
    // interleave is a bijection: distinct inputs → distinct codes
    assert(rows.map(_.getLong(2)).distinct.length === cases.length)
  }

  test("SimHash64 equals the declarative simhash") {
    val both = tokenHashes
      .select(col("doc_id"),
        SimHash64.simhash64(col("th")).as("native"),
        Similarity.simhash(col("th")).as("declarative"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("MinHashSignature equals the declarative minhashSignature") {
    val base = Tables.documents(spark, sfDir)
      .limit(50)
      .select(col("doc_id"),
        Similarity.shingleHashes(Similarity.shingleSet(col("text"), 3)).as("hs"))
    val both = base
      .select(col("doc_id"),
        MinHashSignature.minhashSignature(col("hs"), 16).as("native"),
        Similarity.minhashSignature(col("hs"), 16).as("declarative"))
      .as[(Long, Seq[Long], Seq[Long])]
      .collect()
    both.foreach { case (id, n, d) => assert(n === d, s"doc $id") }
  }

  test("VecCosine equals the declarative cosine bit-for-bit") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val a = emb.filter(col("vec_id") < 5).select(col("v").as("qv"))
    val pairs = emb.crossJoin(a)
    val both = pairs.select(
      Similarity.cosine(col("qv"), col("v")).as("native"),
      Similarity.cosineDeclarative(col("qv"), col("v")).as("declarative"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("SignLshSignature equals the declarative signature") {
    val proj = Similarity.hyperplanes(32, 64, seed = 7)
    val emb = Tables.embeddings(spark, sfDir)
      .select(Similarity.toDouble(col("embedding")).as("v"))
    val both = emb.select(
      Similarity.lshSignature(col("v"), proj).as("native"),
      Similarity.lshSignatureDeclarative(col("v"), proj).as("declarative"))
      .collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("MinHashSignature handles empty input") {
    val r = Seq(Seq.empty[Long]).toDF("hs")
      .select(MinHashSignature.minhashSignature(col("hs"), 4))
      .as[Seq[Long]].head()
    assert(r === Seq(0L, 0L, 0L, 0L))
  }

  test("VecCosine returns null on dimension mismatch (never a prefix cosine)") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(!out(2).isNullAt(0))
  }

  test("NearestCentroids equals the declarative distSq window argmin") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val centDf = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val cents = centDf.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val nprobe = 4
    val native = emb.select(col("vec_id"),
        graft.expressions.VectorExpressions.nearestCentroids(col("v"), cents, nprobe).as("cids"))
      .as[(Long, Seq[Int])].collect().toMap
    // declarative reference: the old explode + window-argmin shape
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
    val declarative = emb.join(broadcast(centDf), lit(true))
      .withColumn("d2", Similarity.distSq(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("rn"), col("cid")))),
        s => s.getField("cid")).as("cids"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(native.size === declarative.size)
    native.foreach { case (id, cids) =>
      assert(cids === declarative(id), s"vec $id")
    }
  }

  test("NearestCentroids: null on dimension mismatch, ties to lower cid") {
    val cents = Array(
      (5, Array(0.0, 0.0)),
      (2, Array(1.0, 1.0)),
      (9, Array(1.0, 1.0))) // duplicate centroid: tie must go to cid 2
    val df = Seq(
      Seq(1.0, 1.0),      // exact-match ties between cid 2 and 9
      Seq(1.0, 1.0, 1.0), // wrong dimension
      Seq(0.1, 0.0)       // nearest 5, then the 2/9 tie
    ).toDF("v")
    val out = df.select(
      graft.expressions.VectorExpressions.nearestCentroids(col("v"), cents, 3).as("c"))
      .collect()
    assert(out(0).getSeq[Int](0) === Seq(2, 9, 5))
    assert(out(1).isNullAt(0))
    assert(out(2).getSeq[Int](0) === Seq(5, 2, 9))
  }

  test("LinearTextScore equals the declarative explode+md5 scoring") {
    import graft.queries.CurationQueries.ClassifierWeights
    val docs = Tables.documents(spark, sfDir).limit(80)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val native = docs.select(col("doc_id"),
        graft.expressions.LinearTextScore
          .linearTextScore(col("toks"), ClassifierWeights, 2).as("s"))
      .as[(Long, Long)].collect().toMap
    // declarative reference: explode unigrams+bigrams, hash via the
    // composed built-ins (md5 → hex parse → mod), replay the weight formula
    val uni = docs.select(col("doc_id"), explode(col("toks")).as("f"))
    val bi = docs.select(col("doc_id"),
      explode(graft.expressions.ShingleStrings.shingleOccurrences(col("toks"), 2)).as("f"))
      .filter(size(split(col("f"), " ")) === 2) // drop the <2-token whole-text window
    val declarative = uni.union(bi)
      .withColumn("bucket",
        conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long") % 1024)
      .withColumn("w", (col("bucket") * 2654435761L + 12345L) % 201L - 100L)
      .groupBy(col("doc_id")).agg(sum(col("w")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native.keySet === declarative.keySet)
    declarative.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
  }

  test("LinearTextScore edge cases: single token has no bigrams; maxNgram=1 drops them") {
    import graft.queries.CurationQueries.ClassifierWeights
    def wOf(f: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      ClassifierWeights((v % 1024).toInt).toLong
    }
    val docs = Seq((1L, Seq("hello")), (2L, Seq("a", "b"))).toDF("doc_id", "toks")
    val out = docs.select(col("doc_id"),
        graft.expressions.LinearTextScore
          .linearTextScore(col("toks"), ClassifierWeights, 2).as("s2"),
        graft.expressions.LinearTextScore
          .linearTextScore(col("toks"), ClassifierWeights, 1).as("s1"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) === ((wOf("hello"), wOf("hello"))))
    assert(out(2L) === ((wOf("a") + wOf("b") + wOf("a b"), wOf("a") + wOf("b"))))
  }

  test("SignLshSignature yields 0 on ANY dimension mismatch (short or long)") {
    val proj = Similarity.hyperplanes(8, 3, seed = 1)
    val df = Seq(
      Seq(1.0, 2.0),            // shorter than dim
      Seq(1.0, 2.0, 3.0, 4.0),  // longer than dim
      Seq(1.0, 2.0, 3.0)        // exact
    ).toDF("v")
    val sigs = df.select(Similarity.lshSignature(col("v"), proj)).as[Int].collect()
    assert(sigs(0) === 0 && sigs(1) === 0)
    assert(sigs(2) !== 0) // overwhelmingly likely with 8 random hyperplanes
  }
}
