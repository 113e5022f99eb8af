package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingSpec extends AnyFunSuite with SparkSpec {

  private def grid(x: Float): Long = math.floor(x * 16 + 0.5).toLong

  private lazy val vecs: Array[(Long, Array[Long])] =
    Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(grid).toArray))

  test("q226: covariance cells carry exact integer moments — diagonal " +
    "non-negative, n constant, one cell recomputed driver-side") {
    val rows = SparkEntry.queries("q226_embedding_covariance")(spark, sfDir)
      .collect()
    assert(rows.length === 64 * 65 / 2)
    val n = vecs.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === n)
      if (r.getAs[Long]("i") == r.getAs[Long]("j"))
        assert(r.getAs[Long]("cov_q") >= 0L,
          s"variance cell (${r.getAs[Long]("i")}) negative")
    }
    // recompute cell (0, 1) exactly
    val (si, sj, sij) = vecs.foldLeft((0L, 0L, 0L)) { case ((a, b, c), (_, q)) =>
      (a + q(0), b + q(1), c + q(0) * q(1)) }
    val c01 = rows.find(r => r.getAs[Long]("i") == 0 && r.getAs[Long]("j") == 1).get
    assert(c01.getAs[Long]("sum_i") === si)
    assert(c01.getAs[Long]("sum_j") === sj)
    assert(c01.getAs[Long]("sum_ij") === sij)
    assert(c01.getAs[Long]("cov_q") === n * sij - si * sj)
  }

  test("q227: centroid drift covers every label pair once and matches a " +
    "driver-side exact recompute") {
    val rows = SparkEntry.queries("q227_centroid_drift")(spark, sfDir)
      .collect()
    val labels = vecs.map(_._1).distinct.sorted
    assert(rows.length === labels.length * (labels.length - 1) / 2)
    val byLabel = vecs.groupBy(_._1)
    val r0 = rows.head
    val (la, lb) = (r0.getAs[Long]("label_a"), r0.getAs[Long]("label_b"))
    val (ga, gb) = (byLabel(la).map(_._2), byLabel(lb).map(_._2))
    val (na, nb) = (BigInt(ga.length), BigInt(gb.length))
    assert(r0.getAs[Long]("na") === na.toLong && r0.getAs[Long]("nb") === nb.toLong)
    val num = (0 until 64).map { k =>
      val sa = BigInt(ga.map(_(k)).sum); val sb = BigInt(gb.map(_(k)).sum)
      val d = sa * nb - sb * na; d * d
    }.sum
    assert(r0.getAs[Long]("dist2_ppm") ===
      (num * 1000000 / (na * nb * na * nb)).toLong)
    rows.foreach(r => assert(r.getAs[Long]("dist2_ppm") >= 0L))
  }

  test("q240: every dimension picks the threshold a driver-side exhaustive " +
    "Otsu search picks, and splits tile the corpus") {
    val rows = SparkEntry.queries("q240_otsu_binarization")(spark, sfDir)
      .collect()
    assert(rows.length === 64)
    val n = vecs.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_l") + r.getAs[Long]("n_r") === n)
      val dim = r.getAs[Long]("dim").toInt
      val col = vecs.map(_._2(dim))
      // exhaustive driver-side search over the same grid with the same
      // quantized criterion and tie rule
      val best = graft.queries.EmbeddingQueries.OtsuThresholds.flatMap { t =>
        val l = col.filter(_ <= t); val rr = col.filter(_ > t)
        if (l.isEmpty || rr.isEmpty) None
        else {
          val (nl, nr) = (BigInt(l.length), BigInt(rr.length))
          val (sl, sr) = (BigInt(l.sum), BigInt(rr.sum))
          val d = sl * nr - sr * nl
          Some((t, (d * d / (nl * nr)).toLong))
        }
      }.sortBy { case (t, s) => (-s, t) }.head
      assert(r.getAs[Long]("threshold") === best._1, s"dim $dim")
      assert(r.getAs[Long]("score_q") === best._2, s"dim $dim")
    }
  }

  test("q241: every mined negative crosses labels, its distance is the " +
    "exact grid distance, and it is never farther than the true " +
    "cross-label nearest neighbor is close") {
    val byId = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Float](2).map(grid).toArray))
      .toMap
    val rows = SparkEntry.queries("q241_hard_negatives")(spark, sfDir)
      .collect()
    assert(rows.length === byId.size)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var found = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      Option(r.getAs[java.lang.Long]("neg_id")).foreach { nid =>
        found += 1
        val (lbl, q) = byId(id)
        val (nlbl, nq) = byId(nid.toLong)
        assert(nlbl != lbl, s"vec $id mined a same-label negative")
        assert(r.getAs[Long]("neg_label") === nlbl)
        assert(r.getAs[Long]("d2") === d2(q, nq))
        // LSH is approximate: the mined negative cannot beat the true
        // cross-label nearest, only tie or lose
        val trueBest = byId.collect {
          case (oid, (ol, oq)) if ol != lbl && oid != id => d2(q, oq) }.min
        assert(r.getAs[Long]("d2") >= trueBest)
      }
    }
    assert(found > byId.size / 2, "LSH buckets found too few hard negatives")
  }

  test("q286: occupancy laws (HHI <= max share, uniform floor, mass " +
    "conservation) and a driver-side argmin recount") {
    import graft.queries.EmbeddingQueries
    val rows = EmbeddingQueries.q286LabelCellOccupancy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === total)
    rows.foreach { r =>
      val cells = r.getAs[Long]("n_cells")
      assert(cells >= 1 && cells <= 16)
      // HHI = Σs² <= max_s·Σs = max share; floor at uniform over n_cells
      assert(r.getAs[Long]("hhi_ppm") <=
        r.getAs[Long]("max_cell_share_ppm") + 1)
      assert(r.getAs[Long]("hhi_ppm") >= 1000000L / cells - 1)
    }
    // recount: assign every vector driver-side by the same argmin rule
    val raw = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val cents = raw.filter(_._1 < 16).sortBy(_._1)
      .map(t => (t._1.toInt, t._2))
    def cell(v: Array[Double]): Int =
      cents.minBy { case (cid, cv) =>
        val d = math.sqrt(cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
        (d, cid)
      }._1
    val manual = raw.groupBy(_._3).map { case (lab, vs) =>
      val byCell = vs.groupBy(v => cell(v._2)).map(_._2.size.toLong)
      lab -> (vs.length.toLong, byCell.size.toLong, byCell.max)
    }
    rows.foreach { r =>
      val (nv, nc, mx) = manual(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_vecs") === nv)
      assert(r.getAs[Long]("n_cells") === nc)
      assert(r.getAs[Long]("max_cell_share_ppm") === mx * 1000000L / nv)
    }
  }

  test("q301: power iteration replays exactly driver-side from the " +
    "covariance matrix in BigInt arithmetic") {
    import graft.queries.EmbeddingQueries
    val loadings = EmbeddingQueries.q301PowerIteration(spark, sfDir)
      .collect().map(r => r.getAs[Long]("dim") -> r.getAs[Long]("loading_scaled"))
    assert(loadings.length === 64)
    assert(loadings.map(l => math.abs(l._2)).max === 1000000L,
      "max-norm step must pin the largest |component| to 1e6")
    // replay: mirror the upper triangle, three normalized BigInt steps
    val upper = EmbeddingQueries.q226EmbeddingCovariance(spark, sfDir)
      .select("i", "j", "cov_q").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, BigInt(r.getLong(2))))
    val m = Array.ofDim[BigInt](64, 64)
    for (i <- 0 until 64; j <- 0 until 64) m(i)(j) = BigInt(0)
    upper.foreach { case (i, j, c) => m(i)(j) = c; if (i != j) m(j)(i) = c }
    var v = Array.fill(64)(BigInt(1000000))
    (1 to 3).foreach { _ =>
      val w = (0 until 64).map(i =>
        (0 until 64).map(j => m(i)(j) * v(j)).sum).toArray
      val mx = w.map(_.abs).max
      // all three (Spark div, DuckDB //, BigInt /) truncate toward zero
      v = w.map(x => x * 1000000 / mx)
    }
    loadings.foreach { case (dim, l) =>
      assert(BigInt(l) === v(dim.toInt), s"dim $dim diverges from replay")
    }
  }

  test("q313: centroid drift replays driver-side — milli-means, cos² " +
    "bounded by 1e6, dist² non-negative, every label present") {
    val rows = SparkEntry.queries("q313_centroid_drift")(spark, sfDir)
      .collect()
    val byLabel = vecs.groupBy(_._1)
    assert(rows.length === byLabel.size)
    // driver-side milli-mean centroids (integer division, truncation
    // toward zero exactly as both engines' div)
    def milliMean(vs: Array[Array[Long]]): Array[BigInt] =
      (0 until 64).map { d =>
        val s = vs.map(v => BigInt(v(d))).sum * 1000
        s / vs.length // BigInt division truncates like SQL div for our signs
      }.toArray
    val g = milliMean(vecs.map(_._2))
    rows.foreach { r =>
      val lbl = r.getAs[Long]("label")
      val m = milliMean(byLabel(lbl).map(_._2))
      val dot = (0 until 64).map(d => m(d) * g(d)).sum
      val na2 = (0 until 64).map(d => m(d) * m(d)).sum
      val nb2 = (0 until 64).map(d => g(d) * g(d)).sum
      val dist2 = (0 until 64).map(d => (m(d) - g(d)) * (m(d) - g(d))).sum
      assert(r.getAs[Long]("cos_sign") === dot.signum.toLong, s"sign: $r")
      assert(r.getAs[Long]("dist2_mm") === dist2.toLong, s"dist2: $r")
      if (na2 != 0 && nb2 != 0) {
        val c2 = (dot * dot * 1000000 / (na2 * nb2)).toLong
        assert(r.getAs[Long]("cos2_ppm") === c2, s"cos2: $r")
        assert(c2 <= 1000000L, "Cauchy-Schwarz violated")
      }
    }
  }

  test("q336: anisotropy replays driver-side on the grid and is a valid ppm") {
    val row = SparkEntry.queries("q336_embedding_anisotropy")(spark, sfDir)
      .collect().head
    val n = BigInt(vecs.length)
    assert(row.getAs[Long]("n_vecs") === vecs.length.toLong)
    // BigInt `/` truncates toward zero — the same convention as Spark's
    // `div` and DuckDB's `//`, so no sign-split is needed
    val dims = vecs.head._2.indices.map { d =>
      (vecs.map(v => BigInt(v._2(d))).sum * 1000) / n
    }
    val a = dims.map(m => m * m).sum
    val e2 = vecs.map(v => v._2.map(x => BigInt(x) * x).sum).sum
    val b = (e2 * 1000000) / n
    assert(BigInt(row.getAs[Long]("mean_norm2_mm2")) === a)
    assert(BigInt(row.getAs[Long]("avg_energy_mm2")) === b)
    if (b != 0) {
      val ppm = (a * 1000000) / b
      assert(BigInt(row.getAs[Long]("anisotropy_ppm")) === ppm)
      assert(ppm >= 0 && ppm <= 1000000,
        s"anisotropy out of range: $ppm")
    }
  }

  private def vecsById: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  test("q361: the greedy MMR selection replays driver-side with the " +
    "sequential-fold cosine, and the 5 picks are distinct non-query ids") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vs = vecsById
    val qv = vs(0L)
    val rel = vs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(qv, v)) }
    var selected = Vector.empty[(Long, Array[Double], Double, Double)]
    for (k <- 1 to 5) {
      val remaining = rel.filterNot(c => selected.exists(_._1 == c._1))
      val scored = remaining.map { case (id, v, r) =>
        val score = if (k == 1) r
          else r * 0.7 - selected.map(s => cos(v, s._2)).max * 0.3
        (id, v, r, score)
      }
      selected :+= scored.minBy { case (id, _, _, sc) => (-sc, id) }
    }
    val rows = SparkEntry.queries("q361_mmr_rerank")(spark, sfDir).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("pick")).toSeq === (1L to 5L))
    rows.zip(selected).foreach { case (r, (id, _, rl, sc)) =>
      assert(r.getAs[Long]("vid") === id, s"pick ${r.getAs[Long]("pick")}")
      assert(r.getAs[Double]("rel") ===
        BigDecimal(rl).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      assert(r.getAs[Double]("mmr_score") ===
        BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    assert(rows.map(_.getAs[Long]("vid")).distinct.length === 5)
    assert(!rows.map(_.getAs[Long]("vid")).contains(0L))
  }

  test("q362: per-cluster silhouette replays driver-side on the integer " +
    "grid and every score is a valid ppm in [-1e6, 1e6]") {
    val vs = vecsById.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 16 + 0.5).toLong) }
    val cents = vs.filter(_._1 < 8).toSeq.sortBy(_._1)
      .map { case (id, q) => (id.toInt, q) }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val per = vs.toSeq.map { case (_, q) =>
      val ds = cents.map { case (cid, cq) => (d2(q, cq), cid) }.sorted
      val (a, own) = ds.head; val (b, _) = ds(1)
      val s = if (math.max(a, b) == 0) 0L else {
        val num = (b - a) * 1000000L
        if (num >= 0) num / math.max(a, b) else -((-num) / math.max(a, b))
      }
      (own, s)
    }
    val rows = SparkEntry.queries("q362_silhouette")(spark, sfDir).collect()
    val byCid = per.groupBy(_._1)
    assert(rows.map(_.getAs[Int]("cid")).toSeq ===
      byCid.keys.toSeq.sorted)
    rows.foreach { r =>
      val ss = byCid(r.getAs[Int]("cid")).map(_._2)
      assert(r.getAs[Long]("n_members") === ss.length.toLong)
      val sum = ss.sum
      val mean = if (sum >= 0) sum / ss.length else -((-sum) / ss.length)
      assert(r.getAs[Long]("mean_s_ppm") === mean)
      assert(r.getAs[Long]("min_s_ppm") === ss.min)
      assert(r.getAs[Long]("max_s_ppm") === ss.max)
      ss.foreach(s => assert(math.abs(s) <= 1000000L))
    }
  }
}
