package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.streaming.{Duration => _}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streaming tumbling agg converges to the batch result (B18)") {
    val batch = StreamingOps.tumblingAgg(Tables.events(spark, sfDir))
      .orderBy("w_start", "event_type").collect().toSeq
    val streamed = StreamingOps.runStreamSync(
      spark, sfDir, StreamingOps.tumblingAgg, "spec_stream_tumbling")
      .orderBy("w_start", "event_type").collect().toSeq
    assert(streamed === batch)
  }

  test("streaming session windows converge to the batch result") {
    val batch = StreamingOps.sessionAgg(Tables.events(spark, sfDir))
      .orderBy("user_id", "s_start").collect().toSeq
    val streamed = StreamingOps.runStreamSync(
      spark, sfDir, StreamingOps.sessionAgg, "spec_stream_session")
      .orderBy("user_id", "s_start").collect().toSeq
    assert(streamed === batch)
  }

  test("mergeSessions folds singletons into session_window semantics, incl. late bridging") {
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.OpenSession
    val gap = 100L
    def ev(ts: Long) = OpenSession(ts, ts, 1, ts) // cents = ts for traceability
    // in-order: 0,50 merge; 200 separate (gap after 50+100)
    assert(StreamingOps.mergeSessions(Seq(ev(0), ev(50), ev(200)), gap) ===
      List(OpenSession(0, 50, 2, 50), OpenSession(200, 200, 1, 200)))
    // a LATE event at 120 bridges the two sessions into one (120 < 50+100
    // and 200 < 120+100) — the case gap-evidence emission would get wrong
    assert(StreamingOps.mergeSessions(
        Seq(OpenSession(0, 50, 2, 50), OpenSession(200, 200, 1, 200), ev(120)), gap) ===
      List(OpenSession(0, 200, 4, 370)))
    // a late event BEFORE an existing session's start extends it backward
    // only if within the gap; farther out it stays its own session
    assert(StreamingOps.mergeSessions(Seq(OpenSession(200, 250, 2, 10), ev(150)), gap) ===
      List(OpenSession(150, 250, 3, 160)))
    assert(StreamingOps.mergeSessions(Seq(OpenSession(200, 250, 2, 10), ev(50)), gap) ===
      List(OpenSession(50, 50, 1, 50), OpenSession(200, 250, 2, 10)))
    // containment: a wide session absorbs a narrow later-starting one
    assert(StreamingOps.mergeSessions(
        Seq(OpenSession(0, 500, 5, 100), OpenSession(100, 120, 2, 20)), gap) ===
      List(OpenSession(0, 500, 7, 120)))
  }

  test("flatMapGroupsWithState custom per-user counter matches batch counts (B18)") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val input = MemoryStream[(Long, Double)](spark, 1)
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }
    val q = counted.toDF("user_id", "n").writeStream
      .outputMode("update").format("memory").queryName("spec_state").start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      input.addData((1L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    // last update per user equals the batch count
    val last = spark.table("spec_state")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(last === Map(1L -> 3L, 2L -> 1L))
  }

  test("foreachBatch streaming upsert converges to last-value-per-key (streaming ETL)") {
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert")
      .resolve("target").toString
    val store = new graft.store.ParquetStore(dir, Seq("id"))
    val input = MemoryStream[(Int, String)](spark, 1)
    val q = input.toDF().toDF("id", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the reference's ETL loop, streaming-shaped: each microbatch is a
        // staging frame upserted into the target
        store.upsert(graft.transform.Transforms.dedupKeyed(
          batch, Seq("id"), Seq(org.apache.spark.sql.functions.col("v").desc)))
      }
      .start()
    try {
      input.addData((1, "a1"), (2, "b1"))
      q.processAllAvailable()
      input.addData((2, "b2"), (3, "c1"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(dir).orderBy("id")
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "a1"), (2, "b2"), (3, "c1")))
  }

  test("stream-stream interval join matches the batch range join") {
    import org.apache.spark.sql.functions._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val purchases = Seq((1L, ts(10)), (1L, ts(30)), (2L, ts(15)))
    val clicks = Seq((1L, ts(8)), (1L, ts(9)), (1L, ts(29)), (2L, ts(1)), (3L, ts(9)))

    // batch reference: clicks within 5 minutes before the purchase
    val bp = purchases.toDF("user_id", "pts")
    val bc = clicks.toDF("c_user", "cts")
    val batch = bp.join(bc,
        col("user_id") === col("c_user") &&
        col("cts") >= col("pts") - expr("INTERVAL 5 MINUTES") &&
        col("cts") < col("pts"))
      .select(col("user_id"), col("pts"), col("cts"))
      .orderBy(col("user_id"), col("pts"), col("cts")).collect().toSeq

    val pIn = MemoryStream[(Long, java.sql.Timestamp)](spark, 1)
    val cIn = MemoryStream[(Long, java.sql.Timestamp)](spark, 1)
    val sp = pIn.toDF().toDF("user_id", "pts").withWatermark("pts", "1 minute")
    val sc = cIn.toDF().toDF("c_user", "cts").withWatermark("cts", "1 minute")
    val joined = sp.join(sc,
      col("user_id") === col("c_user") &&
      col("cts") >= col("pts") - expr("INTERVAL 5 MINUTES") &&
      col("cts") < col("pts"))
    val q = joined.select(col("user_id"), col("pts"), col("cts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("spec_ss_join").start()
    try {
      pIn.addData(purchases)
      cIn.addData(clicks)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("spec_ss_join")
      .orderBy("user_id", "pts", "cts").collect().toSeq
    assert(streamed === batch)
  }

  test("left-outer stream join: matched rows + watermark-proven unmatched only") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.StreamingOps
      .streamStreamLeftOuterJoin(spark, sfDir, "spec_ss_lo")
    val matched = out.filter(col("c_event").isNotNull)
    val inner = graft.streaming.StreamingOps
      .streamStreamIntervalJoin(spark, sfDir, "spec_ss_lo_inner")
    // the matched part is exactly the inner join
    assert(matched.count() === inner.count())
    assert(matched.select("p_event", "c_event")
      .exceptAll(inner.select("p_event", "c_event")).isEmpty)
    // every null-extended purchase lies strictly below the final joint
    // watermark (min of both inputs' max event time, minus the delay)
    val ev = Tables.events(spark, sfDir)
    val maxes = ev.filter(col("event_type").isin("purchase", "click"))
      .groupBy("event_type").agg(max("ts").as("m"))
      .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    val wmMs = math.min(maxes("purchase").getTime, maxes("click").getTime) - 3600000L
    val aboveWm = out.filter(col("c_event").isNull)
      .filter((col("pts").cast("double") * 1000).cast("long") >= wmMs).count()
    assert(aboveWm === 0, "null-extended rows must be watermark-proven")
  }

  test("watermarked append-mode aggregation emits only finalized windows") {
    // MemoryStream lets us advance the watermark explicitly: first batch has
    // early events, second batch a late-arriving straggler + a far-future
    // event that pushes the watermark beyond the first windows.
    val input = MemoryStream[(java.sql.Timestamp, Double)](spark, 1)
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("spec_watermark").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData((ts(0), 1.0), (ts(1), 2.0), (ts(6), 3.0))
      q.processAllAvailable()
      // watermark now 10:06-10m => nothing finalized yet
      val early = spark.table("spec_watermark").count()
      // straggler for 10:00 window (still above watermark) + watermark push
      input.addData((ts(2), 4.0), (ts(59), 5.0))
      q.processAllAvailable()
      input.addData() // one more batch so the new watermark finalizes windows
      q.processAllAvailable()
      val rows = spark.table("spec_watermark")
        .orderBy("w_start").as[(java.sql.Timestamp, Long)].collect().toSeq
      assert(early === 0, "windows must not emit before the watermark passes")
      // 10:00 window contains 10:00,10:01 and the straggler 10:02 => n=3
      assert(rows.exists { case (w, n) => w == ts(0) && n == 3 },
        s"expected finalized 10:00 window with straggler counted, got $rows")
      assert(rows.exists { case (w, n) => w == ts(5) && n == 1 })
    } finally q.stop()
  }

  test("checkpointed file stream restarts without loss or reprocessing") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("graft_ckpt_restart")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id")
    val total = ev.count()
    // three disjoint slices staged as separate stream files
    def stage(slice: Int): Unit = {
      val tmp = root.resolve(s"tmp$slice")
      ev.filter(col("event_id") % 3 === slice).coalesce(1)
        .write.parquet(tmp.toString)
      val part = Files.list(tmp).iterator()
      val f = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(f, srcDir.resolve(s"slice$slice.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def runStream(): Unit = {
      val q = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(0); stage(1)
    runStream() // phase 1: two files, two microbatches
    val afterPhase1 = spark.read.parquet(outDir).count()
    stage(2)
    runStream() // phase 2: RESTART from the checkpoint — only slice 2 is new
    val out = spark.read.parquet(outDir)
    assert(afterPhase1 < total)
    assert(out.count() === total, "restart lost or replayed rows")
    assert(out.select("event_id").distinct().count() === total,
      "restart reprocessed an already-committed file")
  }

  test("transformWithState accumulates across microbatches (update-mode trace shows growth)") {
    // drain the 2-slice stream and read the RAW update-mode sink table:
    // users whose events span both slices must appear twice, the second
    // row strictly larger — proof the ValueState survived the batch
    // boundary rather than each batch starting from zero
    graft.streaming.StreamingOps.transformWithStateTotals(spark, sfDir, "spec_tws")
      .collect() // drains the stream and registers the sink table
    val trace = spark.table("spec_tws")
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val multi = trace.filter(_._2.length >= 2)
    assert(multi.nonEmpty, "no user produced updates in both microbatches")
    multi.foreach { case (u, ns) =>
      assert(ns == ns.sorted && ns.distinct == ns,
        s"user $u: running totals must strictly grow across batches, got $ns")
    }
    // and the final totals equal the batch ground truth
    val totals = trace.view.mapValues(_.max).toMap
    val expected = Tables.events(spark, sfDir)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(totals === expected)
  }

  test("streamUpsertSink replay is idempotent (same final keyed state)") {
    def run() = graft.streaming.StreamingOps.streamUpsertSink(spark, sfDir)
      .orderBy("user_id").collect().toSeq
    val first = run()
    assert(first.nonEmpty)
    assert(run() === first)
  }

  test("q211: every planted near-dup pair is caught, and the catches " +
    "genuinely cross batch boundaries") {
    val flagged = SparkEntry.queries("q211_stream_neardup_screen")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
    val plantOffset = queries.SimilarityQueries.PlantOffset
    val bases = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .select("doc_id").as[Long].collect()
    assert(bases.nonEmpty)
    bases.foreach { b =>
      val t = b + plantOffset
      // whichever of the pair ARRIVES second must be flagged (its twin is
      // already in band-key state); natural near-dups may give it an even
      // smaller partner, so only membership is pinned here — exact
      // partners are the oracle's job
      assert(flagged.contains(b) || flagged.contains(t),
        s"planted pair ($b, $t) escaped the stream screen")
    }
    // the plant offset shifts the slice residue (10000000 % 3 == 1), so
    // every planted catch crossed a batch boundary — require that the
    // flagged doc and its partner really sit in different slices for a
    // healthy share of catches, or the state handoff went untested
    val crossBatch = flagged.count { case (id, p) => id % 3 != p % 3 }
    assert(crossBatch > 0, "no cross-batch catch — state died at the boundary")
  }

  test("q231: streaming append-mode bars equal the batch OHLC restricted " +
    "to watermark-closed windows") {
    val streamed = SparkEntry.queries("q231_stream_ohlc_bars")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val maxTs = Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect().head.getTimestamp(0)
    val batch = SparkEntry.queries("q217_ohlc_bars")(spark, sfDir)
      .filter(unix_timestamp(col("bar_ts")) + 3600 <=
        unix_timestamp(lit(maxTs)) - 3600)
      .select(col("bar_ts"), col("event_type"), col("open"), col("high"),
        col("low"), col("close"), col("n_events"), col("volume"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      s"stream/batch divergence: ${(streamed diff batch).take(2)} / " +
        s"${(batch diff streamed).take(2)}")
  }

  test("q242: streamed sessions equal the batch session_window output " +
    "restricted to watermark-closed sessions") {
    val streamed = SparkEntry.queries("q242_stream_sessions")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val maxTs = Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect().head.getTimestamp(0)
    val batch = StreamingOps.sessionAgg(Tables.events(spark, sfDir))
      .filter(unix_timestamp(col("s_end")) <= unix_timestamp(lit(maxTs)) - 3600)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      s"session stream/batch divergence: ${(streamed diff batch).take(2)} / " +
        s"${(batch diff streamed).take(2)}")
    // sessions are per-user non-overlapping and gap-maximal
    val byUser = streamed.toSeq
      .map(s => (s(0).asInstanceOf[Long],
        s(1).asInstanceOf[java.sql.Timestamp].getTime,
        s(2).asInstanceOf[java.sql.Timestamp].getTime))
      .groupBy(_._1)
    byUser.values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(b._2 >= a._3,
          s"overlapping sessions for user ${a._1}")
        case _ =>
      }
    }
  }

  test("q247: every (user, hour) admits exactly min(3, arrivals) events " +
    "and the limiter actually rejects something") {
    val verdicts = SparkEntry.queries("q247_stream_rate_limit")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Boolean]("allowed")))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        date_trunc("hour", col("ts")).as("h"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.get(2))))
    assert(verdicts.size === ev.length, "every event needs a verdict")
    val byCell = ev.groupBy(_._2)
    byCell.foreach { case (cell, es) =>
      val admitted = es.count(e => verdicts(e._1))
      assert(admitted === math.min(3, es.length), s"cell $cell")
    }
    // sf0.001 has no >3-event (user, hour) cell, so prove the limiter
    // FIRES at limit = 1: every multi-event cell must reject
    val strict = StreamingOps
      .streamRateLimit(spark, sfDir, limit = 1, "graft_test_rl1")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Boolean]("allowed")))
      .toMap
    var rejected = 0
    byCell.foreach { case (cell, es) =>
      val admitted = es.count(e => strict(e._1))
      assert(admitted === 1, s"cell $cell at limit 1")
      rejected += es.length - admitted
    }
    assert(rejected > 0, "multi-event hours exist; limit 1 must reject")
  }

  test("q250: the incremental split is non-trivial (events on both sides " +
    "of the cut, sessions genuinely spanning it) and the result equals " +
    "full sessionization") {
    val ev = Tables.events(spark, sfDir)
    val cut = ev.agg((date_trunc("DAY", min(col("ts")))
      + expr("INTERVAL 20 DAYS")).as("c")).collect().head.getTimestamp(0)
    val before = ev.filter(col("ts") < lit(cut)).count()
    val after = ev.filter(col("ts") >= lit(cut)).count()
    assert(before > 0 && after > 0, "cut must split the fixture")
    val full = StreamingOps.sessionAgg(ev).collect().map(_.toSeq).toSet
    val incr = SparkEntry.queries("q250_incremental_sessions")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(incr === full,
      s"incremental != full: ${(incr diff full).take(2)} / ${(full diff incr).take(2)}")
    // the fixture's day-20 midnight falls between sessions, so drive the
    // tail-merge path directly: synthetic users whose event chains
    // PROVABLY span a known cut (10-minute steps, 30-minute gap)
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val synth = Seq(
      // user 1: chain crossing the cut at minute 100 (events at 80, 95,
      // 110 — each step < gap) plus a separate later session
      (1L, ts(80), 1.0), (1L, ts(95), 2.0), (1L, ts(110), 3.0),
      (1L, ts(300), 4.0),
      // user 2: TWO pre-cut open tails is impossible (tails end the
      // batch), but a tail chained through several post-cut events is
      // the deep case: 90 -> 105 -> 120 -> 135
      (2L, ts(90), 1.0), (2L, ts(105), 1.0), (2L, ts(120), 1.0),
      (2L, ts(135), 1.0),
      // user 3: closed well before the cut, must pass through untouched
      (3L, ts(10), 5.0))
      .toDF("user_id", "ts", "value")
    val cutDf = Seq(Tuple1(ts(100))).toDF("cut")
    val incrSynth = graft.queries.StreamingQueries
      .incrementalSessionize(synth, cutDf).collect().map(_.toSeq).toSet
    val fullSynth = StreamingOps.sessionAgg(synth)
      .select(col("user_id"), col("s_start"), col("s_end"), col("n"),
        col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(incrSynth === fullSynth,
      s"synthetic merge diverged: ${(incrSynth diff fullSynth).take(3)} vs " +
        s"${(fullSynth diff incrSynth).take(3)}")
    // and the spanning sessions really span: user 1's first session runs
    // from minute 80 to 110+30, across the cut at 100
    val u1 = fullSynth.filter(_.head == 1L).toSeq.sortBy(
      _(1).asInstanceOf[java.sql.Timestamp].getTime)
    assert(u1.head(1).asInstanceOf[java.sql.Timestamp].before(ts(100)))
    assert(u1.head(2).asInstanceOf[java.sql.Timestamp].after(ts(100)))
  }

  test("staged stream slices carry strictly increasing mtimes, so batch " +
    "arrival order is guaranteed (not an mtime race)") {
    // stage the events slices, then inspect the files the source reads
    StreamingOps.eventsReadStreamSliced(spark, sfDir, slices = 3)
    val dir = graft.util.Staging.dir("graft_stream_s3", sfDir)
    val times = (0 until 3).map { s =>
      java.nio.file.Files.getLastModifiedTime(
        dir.resolve(s"slice$s.parquet")).toMillis
    }
    assert(times === times.sorted, s"mtimes out of order: $times")
    assert(times.distinct.length === 3, s"mtime tie: $times")
    // wide spacing survives coarse-mtime filesystems
    assert(times.zip(times.tail).forall { case (a, b) => b - a >= 1000 },
      s"mtimes too close for coarse filesystems: $times")
    // the full-fact staging variant (q374's backfill replay) carries the
    // same ordering guarantee
    StreamingOps.eventsReadStreamSlicedFull(spark, sfDir, slices = 3)
    val fdir = graft.util.Staging.dir("graft_stream_f3", sfDir)
    val ftimes = (0 until 3).map { s =>
      java.nio.file.Files.getLastModifiedTime(
        fdir.resolve(s"slice$s.parquet")).toMillis
    }
    assert(ftimes === ftimes.sorted && ftimes.distinct.length === 3,
      s"full-fact slice mtimes unordered or tied: $ftimes")
  }

  test("q278: streaming decontamination equals the q133 batch screen, " +
    "and the stream genuinely spans multiple slices") {
    import graft.queries.{CurationQueries, StreamingQueries}
    val streamed = StreamingQueries.q278StreamDecontam(spark, sfDir)
      .collect().map(_.toString).toSeq
    val batch = CurationQueries.q133ContaminationCheck(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "no contaminated docs - vacuous corpus")
    // non-vacuity of the streaming path: flagged docs arrive in more than
    // one residue slice, so the result required more than one microbatch
    val slices = StreamingQueries.q278StreamDecontam(spark, sfDir)
      .select(pmod(col("doc_id"), lit(3L))).distinct().count()
    assert(slices > 1, "all flagged docs landed in one slice")
  }

  test("q374: backfill replay side equals the batch tumbling aggregate, " +
    "and the reconciliation verdicts are internally consistent") {
    import graft.queries.StreamingQueries
    val out = StreamingQueries.q374StreamBackfill(spark, sfDir).collect()
    assert(out.nonEmpty)
    // a backfill only ADDS events: replay ⊇ stored on every window
    out.foreach { r =>
      val (nOld, nNew) = (r.getLong(2), r.getLong(4))
      val (cOld, cNew) = (r.getLong(3), r.getLong(5))
      assert(nNew >= nOld, s"retraction at ${r.get(0)}: $nOld -> $nNew")
      val verdict = r.getString(6)
      val expect =
        if (nOld == 0L) "added"
        else if (nOld == nNew && cOld == cNew) "unchanged"
        else "changed"
      assert(verdict === expect, s"verdict mismatch at ${r.get(0)}/${r.get(1)}")
    }
    // the late set is non-vacuous: some windows actually changed
    assert(out.exists(_.getString(6) == "changed"),
      "no window changed - the late 5% never landed")
    // the replay column pair must equal the straight batch aggregate of
    // the full slice (streaming execution changes nothing)
    val replay = out.map(r =>
      (r.get(0).toString, r.getString(1), r.getLong(4), r.getLong(5))).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType)).as("cents"))
      .select(col("window.start"), col("event_type"), col("n"), col("cents"))
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(replay === batch, "streaming replay diverged from batch aggregate")
  }
}
