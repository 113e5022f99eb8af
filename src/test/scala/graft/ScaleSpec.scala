package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.Skew

/** Scale-machinery correctness: salted joins/aggs must be result-identical
  * to their plain forms, and bucketed tables must co-locate joins (no
  * exchange on the join key).
  */
class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("z-order layout clusters BOTH key dimensions (tight per-partition spans)") {
    // range-partition + sort lineitem on the Morton code, then measure the
    // per-partition bounding box of each original key: on a Z-curve both
    // spans must shrink far below the global span — the property that makes
    // per-file min/max stats skip files for predicates on EITHER column.
    // (A single-column sort gets one tight span; the other stays global.)
    val zed = graft.queries.ScaleQueries.zorderLineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("zv"))
      .repartitionByRange(16, col("zv"))
      .sortWithinPartitions(col("zv"))
    val spans = zed
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(
        (max(col("l_partkey")) - min(col("l_partkey"))).as("part_span"),
        (max(col("l_suppkey")) - min(col("l_suppkey"))).as("supp_span"))
      .agg(avg(col("part_span")), avg(col("supp_span")))
      .head()
    val global = Tables.lineitem(spark, sfDir)
      .agg(
        max(col("l_partkey")) - min(col("l_partkey")),
        max(col("l_suppkey")) - min(col("l_suppkey")))
      .head()
    assert(spans.getDouble(0) < global.getLong(0) / 2.0,
      s"partkey span ${spans.getDouble(0)} not clustered vs ${global.getLong(0)}")
    assert(spans.getDouble(1) < global.getLong(1) / 2.0,
      s"suppkey span ${spans.getDouble(1)} not clustered vs ${global.getLong(1)}")
  }

  test("compaction collapses the shard count to the target file layout") {
    graft.queries.ScaleQueries.q95Compaction(spark, sfDir).collect()
    val (shards, compact) = graft.queries.ScaleQueries.compactionDirs(sfDir)
    def partFiles(p: java.nio.file.Path): Long = {
      val s = Files.list(p) // Files.list streams must be closed (fd leak)
      try s.filter(f => f.getFileName.toString.startsWith("part-")).count()
      finally s.close()
    }
    assert(partFiles(shards) >= 32, "shard layout must actually be fragmented")
    assert(partFiles(compact) <= 4, "compacted layout must hit the target file count")
  }

  test("bloom pruning shrinks the shuffled fact side without losing matches") {
    val (pruned, dim) = graft.queries.ScaleQueries.bloomPrunedLineitem(spark, sfDir)
    val full = Tables.lineitem(spark, sfDir)
    val nFull = full.count()
    val nPruned = pruned.count()
    // the dim slice is a few % of orders, fpp 1% — the pre-shuffle filter
    // must remove the vast majority of fact rows
    assert(nPruned < nFull / 3, s"bloom kept $nPruned of $nFull rows")
    // and keep EVERY true match (no-false-negative guarantee): the pruned
    // join equals the plain join
    val plain = full.select(col("l_orderkey"))
      .join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val viaBloom = pruned
      .join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBloom === plain)
  }

  test("q165 length bucketing: every batch full (but the tail), padding far below arrival order") {
    val rows = SparkEntry.queries("q165_length_bucketed_batching")(spark, sfDir)
      .select("strategy", "batch_id", "n_docs", "max_len", "padding")
      .as[(String, Long, Long, Long, Long)].collect()
    val byStrat = rows.groupBy(_._1)
    assert(byStrat.keySet === Set("arrival", "bucketed"))
    byStrat.foreach { case (s, bs) =>
      // contiguous batch ids; all full except at most the last
      assert(bs.map(_._2).sorted.toSeq === (0L until bs.length))
      assert(bs.sortBy(_._2).dropRight(1).forall(_._3 === 32L), s)
      bs.foreach { case (_, _, n, mx, pad) =>
        assert(pad >= 0 && pad <= n * mx, s"padding out of bounds in $s")
      }
    }
    val pad = byStrat.map { case (s, bs) => s -> bs.map(_._5).sum }
    assert(pad("bucketed") * 2 < pad("arrival"),
      s"bucketing must at least halve padding waste, got $pad")
  }

  test("saltedJoin equals the plain equi-join") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val outCols = Seq("l_orderkey", "l_quantity", "l_linenumber", "o_totalprice")
    val plain = li.join(orders, Seq("l_orderkey"))
      .select(outCols.map(col): _*)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val salted = Skew.saltedJoin(li, orders, Seq("l_orderkey"), 8)
      .select(outCols.map(col): _*)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(salted === plain)
  }

  test("saltedAgg equals the plain aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("s"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedAgg(
      li,
      keys = Seq("l_returnflag"),
      saltFrom = Seq(col("l_orderkey"), col("l_linenumber")),
      saltBuckets = 8,
      partialAggs = Seq(
        sum(col("l_quantity").cast(DecimalType(12, 2))).as("ps"),
        count(lit(1)).as("pn")),
      mergeAggs = Seq(
        sum(col("ps")).cast(DecimalType(22, 2)).as("s"),
        sum(col("pn")).as("n")))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted === plain)
  }

  test("bucketed tables co-locate the join: no exchange on the join key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sfDir)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem").join(
      spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    // force a non-broadcast join so bucketing is what saves the shuffle
    val planned = joined.hint("merge")
    val plan = planned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is still correct
    assert(planned.count() ===
      Tables.lineitem(spark, sfDir).join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count())
  }

  test("band-join rewrite law: binned equi-join equals the naive nested loop exactly") {
    val q = SparkEntry.queries("q122_band_join")
    val rewritten = q(spark, sfDir).collect().toSeq
    spark.conf.set("spark.graft.bandjoin.rewrite", "false")
    val naive =
      try q(spark, sfDir).collect().toSeq
      finally spark.conf.unset("spark.graft.bandjoin.rewrite")
    assert(rewritten.nonEmpty)
    assert(rewritten === naive)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key owning ~99% of the fact: the classic skew shape. With
    // the skew thresholds lowered to gate-data sizes, AQE must detect the
    // oversized shuffle partition and split it across tasks — the RUNTIME
    // complement to the explicit salting posture (Skew.saltedJoin): salt
    // when the hot key is known ahead of time, AQE when it is not
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = (0 until 200000).map(i =>
        (if (i % 100 == 0) s"k${i % 7}" else "hot", i.toLong))
        .toDF("k", "v")
      val dim = Seq(("hot", 1), ("k0", 2), ("k1", 3)).toDF("k", "grp")
      val joined = fact.join(dim.hint("shuffle_merge"), "k")
        .groupBy("grp").count()
      val rows = joined.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows(1) === 198000L) // every non-multiple-of-100 row is 'hot'
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join split must appear in the final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q192: shard placement is deterministic-idempotent, balanced by md5, " +
    "and adds exactly one (hash, never sampled-range) exchange") {
    // re-run reproduces the manifest byte-for-byte: placement is a pure
    // function of content, so retried tasks / re-runs cannot move a
    // sequence between shards
    val m1 = SparkEntry.queries("q192_training_shards")(spark, sfDir)
      .collect().toSeq
    val m2 = SparkEntry.queries("q192_training_shards")(spark, sfDir)
      .collect().toSeq
    assert(m1 === m2, "shard writer must be re-run idempotent")
    assert(m1.nonEmpty)
    val shards = m1.map(_.getAs[Int]("shard"))
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(shards.distinct.length === shards.length)
    // the shard stage itself: exactly ONE exchange keyed on shard beyond
    // the sequence-assembly plan (whose internal prefix-sum range
    // exchange is fine — bin assignment doesn't depend on its sampled
    // bounds), and the shard key must never ride a rangepartitioning —
    // range bounds come from runtime sampling, which would break the
    // determinism law above
    val plan = graft.queries.TextQueries.shardAssignment(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(shard".r.findAllMatchIn(plan).size === 1,
      s"exactly one shard-keyed exchange expected:\n${plan.take(3000)}")
    assert(!plan.contains("rangepartitioning(shard"),
      s"shard placement must not be sampled-range based:\n${plan.take(3000)}")
  }

  test("q214: every epoch is a bijection over the same sequence set, " +
    "shards are count-balanced, and epochs disagree on order") {
    val rows = SparkEntry.queries("q214_epoch_shuffle")(spark, sfDir).collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet === Set(0, 1, 2))
    // bijection: each epoch carries the SAME sequence count and the SAME
    // subword mass — nothing dropped, nothing duplicated by the reshuffle
    val counts = byEpoch.view.mapValues(_.map(_.getAs[Long]("n_sequences")).sum).toMap
    val masses = byEpoch.view.mapValues(_.map(_.getAs[Long]("n_subwords")).sum).toMap
    assert(counts.values.toSet.size === 1,
      s"epochs carry different sequence counts: $counts")
    assert(masses.values.toSet.size === 1,
      s"epochs carry different subword mass: $masses")
    // equal-depth rank ranges: shard sizes within each epoch differ by <= 1
    byEpoch.foreach { case (e, rs) =>
      val sz = rs.map(_.getAs[Long]("n_sequences"))
      assert(sz.max - sz.min <= 1, s"epoch $e shards unbalanced: ${sz.toSeq}")
    }
    // epochs must actually reshuffle: the per-shard order certificates of
    // epoch 0 and epoch 1 cannot all coincide
    val ord = (e: Int) => byEpoch(e).sortBy(_.getAs[Int]("shard"))
      .map(_.getAs[String]("order_md5")).toSeq
    assert(ord(0) !== ord(1), "epoch 1 replays epoch 0's order")
    assert(ord(1) !== ord(2), "epoch 2 replays epoch 1's order")
  }

  test("winnow df-cap: a planted 200-doc boilerplate family cannot blow " +
    "any fingerprint bucket, and rare overlaps still land") {
    import graft.queries.SimilarityQueries
    // pathological corpus: one boilerplate text syndicated across 200
    // docs — uncapped, its fingerprints would each carry df=200 and the
    // pair join would emit C(200,2) = 19 900 pairs from ONE bucket family
    val boiler = spark.range(0, 200)
      .select((col("id") + 900000000L).as("doc_id"),
        lit("breaking news wire syndicated footer all rights reserved " +
          "contact the newsroom desk for corrections and reprints today")
          .as("text"))
    // plus one genuinely RARE near-dup pair the cap must not price away
    val rare = Seq(
      (800000001L, "unique alpha bravo charlie delta echo foxtrot " +
        "golf hotel india juliet kilo lima"),
      (800000002L, "unique alpha bravo charlie delta echo foxtrot " +
        "golf hotel india juliet kilo lima mike"))
      .toDF("doc_id", "text")
    val docs = boiler.unionByName(rare)
    val w = SimilarityQueries.WinnowW
    val maxDf = SimilarityQueries.WinnowMaxDf
    // (a) the suppression bound: after the df filter, NO fingerprint key
    // feeds more than maxDf rows into the equi-join — the per-bucket pair
    // fan-out is hard-bounded at maxDf² regardless of corpus skew
    val occ = SimilarityQueries.winnowKeptFingerprints(docs, w, maxDf)
      .groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).first().getLong(0)
    assert(occ <= maxDf, s"hot fingerprint bucket survived suppression: $occ")
    // (b) the pair output: zero boilerplate-family pairs (vs 19 900
    // uncapped) — the hot key is priced out entirely, not just trimmed
    val pairs = SimilarityQueries.winnowPairFrame(docs, w, maxDf).collect()
    assert(!pairs.exists(_.getAs[Long]("id_a") >= 900000000L),
      s"boilerplate pair leaked: ${pairs.mkString(";")}")
    // (c) recall on rare content is untouched: the planted near-dup pair
    // shares most window minima and must surface
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 800000001L &&
      r.getAs[Long]("id_b") == 800000002L),
      s"rare near-dup pair lost: ${pairs.mkString(";")}")
  }

  test("q297: zone-map comparison is sound — matched counts agree across " +
    "layouts, skipping never loses a match, and the date layout prunes " +
    "where the arrival layout cannot") {
    val rows = SparkEntry.queries("q297_zonemap_skip")(spark, sfDir)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val (arr, cal) = (rows("arrival"), rows("shipdate_calendar"))
    val total = Tables.lineitem(spark, sfDir).count()
    Seq(arr, cal).foreach { r =>
      assert(r.getAs[Long]("rows_total") === total)
      assert(r.getAs[Long]("rows_matched") <= r.getAs[Long]("rows_scanned"),
        "a skipped zone hid matching rows - pruning is unsound")
      assert(r.getAs[Long]("n_skipped") <= r.getAs[Long]("n_zones"))
      assert(r.getAs[Long]("scan_fraction_ppm") ===
        BigInt(r.getAs[Long]("rows_scanned")) * 1000000 / total)
    }
    // same predicate => same matches, layout-independent
    assert(arr.getAs[Long]("rows_matched") === cal.getAs[Long]("rows_matched"))
    // the fixture's point: orderkey zones straddle the full date range
    // (nothing skippable), calendar zones prune to the quarter
    assert(arr.getAs[Long]("n_skipped") === 0L)
    assert(cal.getAs[Long]("n_skipped") > 0L)
    assert(cal.getAs[Long]("rows_scanned") < arr.getAs[Long]("rows_scanned"))
  }

  test("q371: ring vnode positions are collision-free, assignments replay " +
    "driver-side, and the ring moves far fewer keys than mod") {
    val oldRing = graft.queries.ScaleQueries.ringVnodes(8)
    val newRing = graft.queries.ScaleQueries.ringVnodes(9)
    assert(oldRing.map(_._1).distinct.length === oldRing.length)
    assert(newRing.map(_._1).distinct.length === newRing.length)
    // oldRing vnodes are a subset of newRing (shards 0..7 unchanged), so
    // a key moves on the ring ONLY to the new shard 8
    def assign(ring: Seq[(Long, Int)], h: Long): Int =
      ring.find(_._1 >= h).getOrElse(ring.head)._2
    def p32(s2: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        d.digest(s2.getBytes("UTF-8")).take(4).map("%02x".format(_))
          .mkString, 16)
    }
    val keys = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().as[Long].collect()
    val hs = keys.map(u => p32(u.toString))
    val modMoved = hs.count(h => h % 8 != h % 9).toLong
    val ringMoved = hs.count(h =>
      assign(oldRing, h) != assign(newRing, h)).toLong
    hs.foreach { h =>
      if (assign(oldRing, h) != assign(newRing, h))
        assert(assign(newRing, h) === 8, "ring moves must target shard 8")
    }
    val rows = SparkEntry.queries("q371_shard_rebalance")(spark, sfDir)
      .collect()
    val m = rows.find(_.getString(0) == "mod").get
    val r = rows.find(_.getString(0) == "ring").get
    assert(m.getAs[Long]("n_keys") === keys.length.toLong)
    assert(m.getAs[Long]("moved_keys") === modMoved)
    assert(r.getAs[Long]("moved_keys") === ringMoved)
    assert(r.getAs[Long]("moved_ppm") < m.getAs[Long]("moved_ppm"),
      "consistent hashing must beat mod on migration volume")
  }
}
