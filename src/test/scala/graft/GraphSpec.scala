package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

class GraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q141: components are true transitive closures of the pair set") {
    val comp = GraphQueries.q141NearDupComponents(spark, sfDir)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    // every confirmed pair must be co-labeled (single-hop soundness)
    val pairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(comp(a) === comp(b), s"pair ($a, $b) split across components")
    }
    // the label is the smallest member of its component
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
  }

  test("q150: incremental component merge equals the full recompute") {
    val full = GraphQueries.q141NearDupComponents(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val incr = GraphQueries.q150IncrementalComponents(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(incr === full)
  }

  test("q142: unrolled PageRank iterates over materialized edge/degree " +
    "frames (no per-round fact-join replay)") {
    val df = GraphQueries.q142PageRank(spark, sfDir)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.take(cut) else plan
    // round 15: the edge/degree relations are localCheckpoint'd once and
    // every unrolled iteration reads the materialized RDD — the final
    // plan must scan ExistingRDD and must NOT re-derive orders⋈lineitem
    // (a FileScan in the iteration tree would mean the fact join replays
    // per round)
    assert(finalPlan.contains("Scan ExistingRDD"),
      s"iterations must read the checkpointed frames:\n${finalPlan.take(6000)}")
    assert(!finalPlan.contains("FileScan"),
      s"fact join must not replay inside the iteration tree:\n${finalPlan.take(6000)}")
    // every node keeps at least the teleport mass, and total scaled mass
    // stays within the floor-division leakage bound (each div drops < 1
    // unit per edge/node)
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("rank_scaled") >= 150000000L))
  }

  test("q200: degree-oriented census equals brute-force triangle enumeration") {
    val row = SparkEntry.queries("q200_triangle_census")(spark, sfDir)
      .collect().head
    // independent reference: enumerate triangles driver-side from the
    // collected pair set (tiny at spec scale)
    val pairs = queries.SimilarityQueries.q36DedupMinhash(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val pairSet = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val bruteTris = (for {
      (a, b) <- pairSet.iterator
      c <- (adj(a) intersect adj(b)) if c > b
    } yield (a, b, c)).size.toLong
    val bruteWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(row.getAs[Long]("n_triangles") === bruteTris)
    assert(row.getAs[Long]("n_wedges") === bruteWedges)
    assert(row.getAs[Long]("n_edges") === pairSet.size.toLong)
    assert(row.getAs[Long]("n_nodes") === adj.size.toLong)
    // the census must be non-vacuous at spec scale or the oriented-join
    // path is untested
    assert(bruteWedges > 0, "pair graph has no wedges — census vacuous")
  }

  test("q204: bounded-round peel equals driver-side k-core, and the " +
    "fixpoint is reached inside the 8-round budget") {
    val out = GraphQueries.q204KCoreDecomposition(spark, sfDir)
      .select("doc_id", "coreness").as[(Long, Long)].collect().toMap
    val pairs = queries.SimilarityQueries.q36DedupMinhash(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // driver-side reference: peel to the TRUE fixpoint (no round bound)
    def core(k: Int): Set[Long] = {
      var adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
      var rounds = 0
      var changed = true
      while (changed) {
        val keep = adj.filter { case (n, vs) => (vs intersect adj.keySet).size >= k }.keySet
        changed = keep.size != adj.size
        adj = adj.collect { case (n, vs) if keep(n) =>
          n -> (vs intersect keep) }.filter(_._2.nonEmpty)
        rounds += 1
        assert(rounds <= 8,
          s"$k-core peel needs > 8 rounds at spec scale — raise the budget")
      }
      adj.keySet
    }
    val c2 = core(2); val c3 = core(3)
    val allNodes = pairs.flatMap { case (a, b) => Seq(a, b) }.toSet
    assert(out.keySet === allNodes)
    out.foreach { case (n, c) =>
      val expected = if (c3(n)) 3L else if (c2(n)) 2L else 1L
      assert(c === expected, s"node $n: coreness $c, expected $expected")
    }
    // non-vacuous: the gate corpus must exercise every rung of the ladder
    assert(out.values.toSet === Set(1L, 2L, 3L),
      "corpus lacks a coreness level — the peel is untested at that k")
  }

  test("q269: the dedup map covers EVERY doc, keeps exactly the " +
    "canonicals, and agrees with q141 on the clustered docs") {
    val map269 = SparkEntry.queries("q269_dedup_map")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Boolean]("keep"))).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    val nPlants = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).count()
    assert(map269.size.toLong === nDocs + nPlants, "map must cover the corpus")
    map269.foreach { case (id, (canon, keep)) =>
      assert(canon <= id, "canonical is the min of the cluster")
      assert(keep === (id == canon))
      // canonicals are closed under the map: canon maps to itself
      assert(map269(canon)._1 === canon, s"canonical $canon not a fixpoint")
    }
    val clustered = SparkEntry.queries("q141_neardup_components")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    clustered.foreach { case (id, comp) =>
      assert(map269(id)._1 === comp, s"doc $id disagrees with q141") }
    // singletons keep themselves
    (map269.keySet -- clustered.keySet).foreach { id =>
      assert(map269(id)._2, s"singleton $id must be kept") }
    // the kept set is exactly corpus minus (cluster members - canonicals)
    val dropped = map269.count(!_._2._2)
    assert(dropped.toLong ===
      clustered.size - clustered.values.toSet.size)
  }

  test("q271: frontier merge handles base-cluster merge, cross-base bridge, " +
    "new component, and untouched passthrough on a planted topology") {
    import graft.functions.Similarity
    // base graph: {1,2,3} (label 1), {5,6} (label 5 — untouched),
    // {7,8} and {9,12} (to be BRIDGED by the delta)
    val basePairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (9L, 12L))
      .toDF("id_a", "id_b")
    val baseLabels = Similarity.connectedComponentsStar(basePairs)
    // delta: extend {1,2,3} with 4; bridge {7,8}+{9,12} via (8,9);
    // brand-new component {10,11}
    val deltaPairs = Seq((3L, 4L), (8L, 9L), (10L, 11L)).toDF("id_a", "id_b")
    val merged = GraphQueries.incrementalMerge(baseLabels, deltaPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,  // extended
      5L -> 5L, 6L -> 5L,                       // untouched passthrough
      7L -> 7L, 8L -> 7L, 9L -> 7L, 12L -> 7L,  // bridged, min label wins
      10L -> 10L, 11L -> 10L))                  // new component
  }

  test("q271: frontier-scoped incremental equals q141 full recompute, " +
    "non-vacuously (both base and delta pairs exist)") {
    val pairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    val isD = (x: Long) => ((x % 7) + 7) % 7 == 0
    assert(pairs.exists { case (a, b) => !isD(a) && !isD(b) },
      "no base pairs - the test corpus makes the split vacuous")
    assert(pairs.exists { case (a, b) => isD(a) || isD(b) },
      "no delta pairs - the test corpus makes the split vacuous")
    val inc = GraphQueries.q271FrontierComponents(spark, sfDir)
      .collect().map(_.toString).toSeq
    val full = GraphQueries.q141NearDupComponents(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(inc === full)
  }

  test("q271: persisted base-index path is result-identical and really " +
    "reads the index") {
    import graft.functions.Similarity
    // persist exactly what the default path derives as the base index
    val pairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .select(col("id_a"), col("id_b"))
    val basePairs = pairs.filter(
      pmod(col("id_a"), lit(7L)) =!= 0 && pmod(col("id_b"), lit(7L)) =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("q271base").toString
    Similarity.connectedComponentsStar(basePairs)
      .write.mode("overwrite").parquet(tmp)
    val direct = GraphQueries.q271FrontierComponents(spark, sfDir)
      .collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.incr.baseComponentTable", tmp)
    try {
      val viaIndex = GraphQueries.q271FrontierComponents(spark, sfDir)
      assert(viaIndex.collect().map(_.toString).toSeq === direct)
      val plan = viaIndex.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(tmp).getName), plan.take(2000))
    } finally spark.conf.unset("spark.graft.incr.baseComponentTable")
  }

  test("q308: production path equals gate q271, stages idempotently, " +
    "and restores the conf") {
    val direct = GraphQueries.q271FrontierComponents(spark, sfDir)
      .collect().map(_.toString).toSeq
    val before = spark.conf.getOption("spark.graft.incr.baseComponentTable")
    val prod = GraphQueries.q308IncrComponentsProd(spark, sfDir)
    assert(prod.collect().map(_.toString).toSeq === direct)
    // conf restored (the persisted-index pointer must not leak to later
    // queries), and the plan reads the staged index, not a re-derivation
    assert(spark.conf.getOption("spark.graft.incr.baseComponentTable")
      === before)
    val plan = prod.queryExecution.executedPlan.toString
    assert(plan.contains("graft_base_components_idx"), plan.take(2000))
    // second construction must hit the marker (no re-write): the marker
    // conf records the staged dir
    assert(spark.conf.getOption("spark.graft.layout.base_components_idx")
      .contains(sfDir))
    assert(GraphQueries.q308IncrComponentsProd(spark, sfDir)
      .collect().map(_.toString).toSeq === direct)
  }

  test("q280: cohesion laws — spanning-tree floor, clique ceiling, " +
    "pair mass conservation, 2-clusters are cliques") {
    val rows = GraphQueries.q280ClusterCohesion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalPairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .count()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      val p = r.getAs[Long]("n_confirmed_pairs")
      assert(n >= 2, "q141 labels only clustered docs")
      // the closure is BUILT from these pairs: connectivity needs at
      // least a spanning tree, and at most the complete graph
      assert(p >= n - 1, s"cluster disconnected in its own pair set: $r")
      assert(p <= n * (n - 1) / 2, s"pair overcount: $r")
      assert(r.getAs[Long]("density_ppm") <= 1000000L)
      if (n == 2)
        assert(r.getAs[Long]("density_ppm") === 1000000L,
          "a 2-cluster is definitionally a clique")
    }
    // every confirmed pair lands in exactly one cluster
    assert(rows.map(_.getAs[Long]("n_confirmed_pairs")).sum === totalPairs)
  }

  test("q295: HITS scores are max-normalized and the final hub step " +
    "replays exactly from the authority scores") {
    val rows = GraphQueries.q295Hits(spark, sfDir).collect()
    val hubs = rows.filter(_.getAs[String]("role") == "hub")
      .map(r => r.getAs[Long]("entity_key") -> r.getAs[Long]("score_scaled"))
      .toMap
    val auths = rows.filter(_.getAs[String]("role") == "authority")
      .map(r => r.getAs[Long]("entity_key") -> r.getAs[Long]("score_scaled"))
      .toMap
    assert(hubs.nonEmpty && auths.nonEmpty)
    assert(hubs.values.max === 1000000L, "hub scores must normalize to 1e6")
    assert(auths.values.max === 1000000L,
      "authority scores must normalize to 1e6")
    assert(rows.forall(_.getAs[Long]("score_scaled") > 0),
      "every node in the order graph touches at least one edge")
    // law: h2(src) = floor(Σ_dst a2(dst) * 1e6 / max), replayed driver-side
    val edges = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().as[(Long, Long)].collect()
    val raw = edges.groupBy(_._1).map { case (src, es) =>
      src -> es.map(e => BigInt(auths(e._2))).sum
    }
    val mx = raw.values.max
    raw.foreach { case (src, w) =>
      assert(BigInt(hubs(src)) === w * 1000000 / mx,
        s"hub $src does not replay from authority scores")
    }
  }

  test("q325: assortativity sums replay from the edge list, including the " +
    "sum-of-degrees-squared identity") {
    val row = SparkEntry.queries("q325_degree_assortativity")(spark, sfDir)
      .collect().head
    val pairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "near-dup graph is empty at sf0.001")
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val m = pairs.length.toLong
    assert(row.getAs[Long]("m_edges") === m)
    val sJk = pairs.map { case (a, b) => BigInt(deg(a)) * deg(b) }.sum
    val sSum = pairs.map { case (a, b) => BigInt(deg(a)) + deg(b) }.sum
    val sSq = pairs.map { case (a, b) =>
      BigInt(deg(a)) * deg(a) + BigInt(deg(b)) * deg(b) }.sum
    assert(BigInt(row.getAs[Long]("s_jk")) === sJk)
    assert(BigInt(row.getAs[Long]("s_sum")) === sSum)
    assert(BigInt(row.getAs[Long]("s_sq")) === sSq)
    // identity: summing (deg_u + deg_v) over undirected edges counts each
    // node's degree exactly deg(v) times
    assert(sSum === deg.values.map(d => BigInt(d) * d).sum)
    val rNum = 4 * m * sJk - sSum * sSum
    val rDen = 2 * m * sSq - sSum * sSum
    assert(BigInt(row.getAs[Long]("r_num")) === rNum)
    assert(BigInt(row.getAs[Long]("r_den")) === rDen)
    assert(rDen >= 0)
    val ppm = if (rDen == 0) BigInt(0)
      else if (rNum >= 0) rNum * 1000000 / rDen
      else -((-rNum) * 1000000 / rDen)
    assert(BigInt(row.getAs[Long]("r_ppm")) === ppm)
    assert(ppm.abs <= 1000000)
  }

  test("q333: the quality canonical is each component's argmax by " +
    "(length, -id), singletons self-survive, and keep counts match q269") {
    val map333 = SparkEntry.queries("q333_quality_canonical_map")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val comp = GraphQueries.q141NearDupComponents(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // planted corpus quality: base docs + the %5 twins with one more token
    val qual = {
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id"), length(col("text")).cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      (base ++ base.collect { case (id, q) if id % 5 == 0 =>
        (id + 10000000L, q + 7L) }).toMap // " zz9end" adds 7 chars
    }
    assert(map333.keySet === qual.keySet)
    // clustered docs: canonical = argmax (qual desc, id asc) of the component
    comp.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.map(_._1).toSeq
      val expect = ids.minBy(id => (-qual(id), id))
      ids.foreach { id =>
        assert(map333(id)._1 === expect, s"canonical mismatch for $id")
        assert(map333(id)._2 === (id == expect))
      }
    }
    // singletons self-survive
    map333.foreach { case (id, (canon, keep)) =>
      if (!comp.contains(id)) { assert(canon === id); assert(keep) } }
    // same survivor COUNT as q269 (different survivors, same cardinality)
    val keep269 = SparkEntry.queries("q269_dedup_map")(spark, sfDir)
      .filter(col("keep")).count()
    assert(map333.values.count(_._2).toLong === keep269)
  }

  test("q342: the hop census replays a driver-side BFS and conserves " +
    "every component's membership") {
    val rows = SparkEntry.queries("q342_cluster_depth")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val comp = GraphQueries.q141NearDupComponents(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val pairs = SparkEntry.queries("q36_dedup_minhash")(spark, sfDir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val c = r.getLong(0)
      val members = comp.filter(_._2 == c).map(_._1).toSet
      assert(r.getAs[Long]("n_members") === members.size.toLong)
      // BFS from the canonical (= the component label)
      var seen = Set(c)
      var frontier = Set(c)
      val levels = (1 to 3).map { _ =>
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= next; frontier = next
        next.size.toLong
      }
      assert(r.getAs[Long]("n_hop1") === levels(0), s"hop1 of $c")
      assert(r.getAs[Long]("n_hop2") === levels(1), s"hop2 of $c")
      assert(r.getAs[Long]("n_hop3") === levels(2), s"hop3 of $c")
      assert(r.getAs[Long]("n_beyond") ===
        members.size - 1 - levels.sum)
      assert(r.getAs[Long]("n_beyond") >= 0)
    }
  }
}
