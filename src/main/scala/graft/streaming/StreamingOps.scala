package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-streaming operators over the `events` table (north-star tier
  * B18): tumbling/sliding/session windows, batch-equivalent forms, and a
  * synchronous streaming executor for verification.
  *
  * Design: every windowed aggregation exists in a BATCH form (verifiable
  * against the DuckDB oracle) and the STREAMING form is the same expression
  * applied to a readStream — Spark guarantees the same semantics, and the
  * sync runner proves it by materializing the stream into a memory sink and
  * returning the identical result. At production scale the streaming form
  * runs with `withWatermark` + append mode; here complete mode keeps the
  * final microbatch equal to the batch answer on a bounded input.
  */
// Serializable: the flatMapGroupsWithState function is a nested def whose
// eta-expanded lambda captures this module instance (stateless — nothing
// beyond the class ref is serialized)
object StreamingOps extends Serializable {

  /** Copy a staged slice file into the stream dir and pin its mtime to a
    * fixed, strictly-increasing timestamp. FileStreamSource orders files
    * by modification time; with fast copies on a coarse-mtime filesystem
    * slice mtimes can tie, making batch ARRIVAL order incidental — and
    * order-sensitive consumers (q247's admission decisions, q211's
    * earliest-seen partner, q250's cross-batch handoff) rely on
    * slice0 < slice1 < slice2. An explicit FileTime per slice makes the
    * order a guarantee, not an accident of copy speed.
    */
  private def stageSliceOrdered(src: java.nio.file.Path,
      dst: java.nio.file.Path, slice: Int): Unit = {
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(
        1600000000000L + slice * 60000L))
  }

  /** ONCE-PER-SESSION STAGING (round 12, the streaming-harness
    * consolidation): slice staging is deterministic from the input table
    * (residue split, coalesce(1), fixed FileTime order), yet every gate
    * construction re-ran the write jobs — 14 streaming gates × 3 slices
    * of redundant Spark writes per bench sweep. A marker conf (q120's
    * persisted-index posture) records that a staging dir is already
    * populated for this (dir-key) in THIS session, so later constructions
    * skip straight to the readStream. Gate SEMANTICS are untouched: the
    * staged bytes are identical whether written now or earlier.
    *
    * The marker keys on the SOURCE FILE's (size, mtime) fingerprint in
    * addition to the caller's key (round 13): a plain dir-string marker
    * would keep saying "done" after the source parquet is rewritten
    * mid-session and silently stream stale bytes. A source rewrite now
    * changes the fingerprint, misses the marker, and re-stages. The guard
    * is scoped to SOURCE rewrites only — a foreign process clobbering the
    * staged files themselves still matches the marker (fingerprinting the
    * staged slices too would cost a stat per gate per construction for a
    * failure mode nothing in this sandbox produces). A source parquet
    * that has gone missing re-stages rather than throwing on the stat:
    * the write itself then raises the real, actionable read error.
    */
  private def stagedOnce(spark: SparkSession, marker: String, key: String,
      srcs: java.nio.file.Path*)(write: => Unit): Unit = {
    val fp = srcs.map { p =>
      try {
        val a = java.nio.file.Files.readAttributes(
          p, classOf[java.nio.file.attribute.BasicFileAttributes])
        s"${a.size}:${a.lastModifiedTime.toMillis}"
      } catch { case _: java.io.IOException => "absent" }
    }.mkString(key + "|", ",", "")
    if (!spark.conf.getOption(marker).contains(fp)) {
      write
      spark.conf.set(marker, fp)
    }
  }

  /** Tumbling-window aggregate (batch form). 6-hour windows are
    * epoch-aligned in both Spark and DuckDB's time_bucket.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // exact decimal sum, then ONE IEEE cast to double for the output
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(38, 2))
          .cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Tumbling aggregate with an event-time WATERMARK — the production
    * streaming posture (append mode): a window emits exactly once, when
    * the watermark (max event time − delay) passes its end, and its state
    * is dropped — state stays bounded no matter how long the stream runs,
    * unlike complete-mode which accumulates every window forever. On a
    * bounded input the result is deterministic: every window whose end ≤
    * final watermark.
    */
  def tumblingAggWatermarked(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(38, 2))
          .cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-static enrichment: the streaming fact joined to a BATCH
    * dimension (the lookup-table pattern — reference data loaded once,
    * every microbatch joins against it). The dim side is broadcast, so
    * each microbatch is a map-side hash join with no stateful join
    * operator and no watermark requirement — unlike stream-stream joins,
    * stream-static joins are stateless by construction. Aggregation then
    * windows on event time per dimension attribute.
    */
  def enrichedTumblingAgg(
      dim: DataFrame, dimKey: String, segment: String)(
      events: DataFrame): DataFrame =
    events
      .join(broadcast(dim), events("user_id") === dim(dimKey))
      .groupBy(window(col("ts"), "6 hours"), col(segment))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(38, 2))
          .cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("w_start"), col(segment), col("n"), col("sum_value"))

  /** Sliding-window aggregate: 1-hour windows every 30 minutes — each event
    * lands in exactly two windows.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows per user with a 30-minute gap: a new session starts
    * when an event arrives ≥ gap after the previous one; session end =
    * last event + gap (Spark's session_window semantics, mirrored in the
    * oracle's lag/cumsum rewrite).
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(38, 2))
          .cast(DoubleType).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n"), col("sum_value"))

  /** Streaming source over the events parquet (one file per microbatch).
    * The file-stream source requires a DIRECTORY, so the single-file
    * testdata table is staged under a per-input temp dir; `ts` arrives as
    * INT64 nanos (see graft.Tables.events) and is converted identically.
    */
  def eventsReadStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staticSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val src = java.nio.file.Paths.get(dir, "events.parquet")
    // collision-safe staging dir (see graft.util.Staging); ALWAYS refresh
    // the copy (a stale copy would silently stream outdated input after
    // the source file changes)
    val streamDir = graft.util.Staging.dir("graft_stream", dir)
    stagedOnce(spark, "spark.graft.layout.stream", dir, src) {
      java.nio.file.Files.createDirectories(streamDir)
      val staged = streamDir.resolve("events.parquet")
      java.nio.file.Files.copy(src, staged,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val raw = spark.readStream
      .schema(staticSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
    if (staticSchema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Synchronously drain a streaming query into a memory sink and return
    * the materialized table.
    *
    * Stateful operators commit one state store PER SHUFFLE PARTITION per
    * microbatch (a stream-stream join commits four stores per partition),
    * so the batch session's 32 partitions mean ~128 store commits a batch
    * — pure overhead at gate input sizes. The partition count is pinned
    * lower for the streaming query (state partitioning is fixed at batch 0
    * by the checkpoint, so this must be set before `start()`); results are
    * partitioning-independent. At production scale this knob RISES with
    * state volume — it is per-query, which is exactly the point.
    *
    * Round-13 measurement, idle box, 15-query streaming subset at
    * sf0.1: the knee DEPENDS ON THE SESSION'S CORE COUNT. At 4 cores,
    * 8 partitions → 31.4 s vs 4 → 27.8 s (commit overhead dominates
    * when partitions outnumber cores); at the driver's 32 cores, 8 →
    * 28.5 s vs 4 → 28.9 s — a wash, with the per-query deltas mixed.
    * The default stays 8 (the driver benches at 32 cores, where it is
    * not worse and keeps more state parallelism headroom); the
    * parameter remains the per-query tuning surface either way.
    */
  private def drainToTable(
      spark: SparkSession, out: DataFrame, queryName: String,
      outputMode: String, statePartitions: Int = 8): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = out.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(queryName)
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.table(queryName)
  }

  /** Run a streaming aggregation over the events parquet synchronously:
    * readStream (one file per microbatch) → agg → memory sink → final
    * table. Returns the materialized result; semantics match the batch
    * form on bounded input.
    */
  def runStreamSync(
      spark: SparkSession,
      dir: String,
      agg: DataFrame => DataFrame,
      queryName: String,
      outputMode: String = "complete"): DataFrame =
    drainToTable(spark, agg(eventsReadStream(spark, dir)), queryName, outputMode)

  /** Streaming ingest DEDUP, production posture: duplicates dropped by key
    * within the watermark horizon (`dropDuplicatesWithinWatermark` keeps
    * per-key state only until the watermark passes — bounded state on an
    * unbounded stream, unlike plain streaming dropDuplicates, whose state
    * grows forever). The input is the events stream UNIONED WITH ITSELF, so
    * every event arrives (at least) twice and the operator must eliminate a
    * real 2× duplication; on bounded input the result is exactly the
    * distinct event set, which a batch oracle replays.
    */
  def streamDedup(
      spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val cols = Seq("event_id", "user_id", "ts", "event_type", "value").map(col)
    def side = eventsReadStream(spark, dir).select(cols: _*)
    val doubled = side.unionByName(side)
    val deduped = doubled
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    drainToTable(spark, deduped, queryName, "append")
  }

  /** Per-user running totals carried in a [[ValueState]] by
    * [[TotalsProcessor]] — flat longs so the RocksDB state encoding stays
    * small and the arithmetic exact.
    */
  case class RunningTotals(user_id: Long, n: Long, sum_cents: Long)

  /** The transformWithState API (Spark 4's arbitrary-state operator, the
    * successor surface to flatMapGroupsWithState): explicit keyed state
    * handles (Value/List/Map) acquired in init, per-batch input iterators,
    * optional timers. This processor accumulates per-user event count and
    * exact cent sums across microbatches and emits the RUNNING total
    * after each batch — update-mode output, RocksDB-backed state.
    */
  class TotalsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), RunningTotals] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[RunningTotals] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, cents) => n += 1; s += cents }
      totals.update((n, s))
      Iterator.single(RunningTotals(key, n, s))
    }
  }

  /** Stage the events table as `slices` separate stream files (by event_id
    * residue) so `maxFilesPerTrigger=1` yields a genuinely MULTI-BATCH
    * bounded stream — cross-batch state is actually exercised, unlike the
    * single-file replay.
    */
  def eventsReadStreamSliced(spark: SparkSession, dir: String, slices: Int): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
    val streamDir = graft.util.Staging.dir(s"graft_stream_s$slices", dir)
    stagedOnce(spark, s"spark.graft.layout.stream_s$slices", dir,
        java.nio.file.Paths.get(dir, "events.parquet")) {
      Files.createDirectories(streamDir)
      (0 until slices).foreach { s =>
        val tmp = Files.createTempDirectory("graft_slice")
        // null-safe slice key: a NULL event_id must land in SOME slice (the
        // batch oracles aggregate ALL events), not silently vanish from all
        ev.filter(pmod(coalesce(col("event_id"), lit(0L)), lit(slices.toLong)) === s)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(tmp).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        stageSliceOrdered(part, streamDir.resolve(s"slice$s.parquet"), s)
      }
    }
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
  }

  /** Timestamp-carrying twin of [[eventsReadStreamSliced]] (that one
    * drops `ts` for the cents aggregations): (event_id, user_id, ts_us)
    * staged as `slices` files by event_id residue. `ts` travels as
    * LONG microseconds so the staged parquet needs no NTZ ceremony.
    */
  def eventsReadStreamSlicedTs(spark: SparkSession, dir: String,
      slices: Int): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"))
    val streamDir = graft.util.Staging.dir(s"graft_stream_ts$slices", dir)
    stagedOnce(spark, s"spark.graft.layout.stream_ts$slices", dir,
        java.nio.file.Paths.get(dir, "events.parquet")) {
      Files.createDirectories(streamDir)
      (0 until slices).foreach { s =>
        val tmp = Files.createTempDirectory("graft_slice_ts")
        ev.filter(pmod(coalesce(col("event_id"), lit(0L)), lit(slices.toLong)) === s)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(tmp).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        stageSliceOrdered(part, streamDir.resolve(s"slice$s.parquet"), s)
      }
    }
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
  }

  /** Full-fact events stream in ordered slices — (event_id, user_id,
    * ts_us, event_type, cents): the backfill replay (q374) reprocesses the
    * complete historical fact row, so unlike [[eventsReadStreamSliced]]
    * (cents only) and [[eventsReadStreamSlicedTs]] (ts only) this variant
    * carries both the event-time axis and the measure. `ts` travels as
    * LONG microseconds (no NTZ ceremony); `value` as exact integer cents.
    */
  def eventsReadStreamSlicedFull(spark: SparkSession, dir: String,
      slices: Int): DataFrame = {
    import java.nio.file.Files
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType)
          .as("cents"))
    val streamDir = graft.util.Staging.dir(s"graft_stream_f$slices", dir)
    stagedOnce(spark, s"spark.graft.layout.stream_f$slices", dir,
        java.nio.file.Paths.get(dir, "events.parquet")) {
      Files.createDirectories(streamDir)
      (0 until slices).foreach { s =>
        val tmp = Files.createTempDirectory("graft_slice_f")
        ev.filter(pmod(coalesce(col("event_id"), lit(0L)), lit(slices.toLong)) === s)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(tmp).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        stageSliceOrdered(part, streamDir.resolve(s"slice$s.parquet"), s)
      }
    }
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
  }

  /** STREAMING BACKFILL / REPLAY RECONCILIATION (q374) — the missing
    * lifecycle operator around the materialized-view family: when late
    * data lands (or a metric definition is corrected), production
    * pipelines REPLAY the historical slice through the same streaming
    * operators and reconcile against the previously-materialized table,
    * emitting a per-window change report the downstream owner signs off
    * on — not a blind overwrite.
    *
    * Construction: the "stored" view is the 6-hour tumbling aggregate as
    * materialized BEFORE the late arrivals landed (deterministically: the
    * 5% of events with event_id % 20 = 0 are the late set — absent from
    * the stored build). The replay side reprocesses the FULL slice
    * through a real multi-microbatch streaming execution
    * ([[eventsReadStreamSlicedFull]], 3 slices) in COMPLETE mode — the
    * correct backfill posture: the slice is bounded and every window of
    * it must re-emit, not a watermark-censored suffix (append mode is
    * the forward-arrival posture, q73). Reconciliation is a left join
    * from the replay (a backfill only ever ADDS events here, so replay
    * windows ⊇ stored windows) with a verdict per window:
    * added / changed / unchanged.
    *
    * Scale shape: both sides are keyed tumbling aggregates (map-side
    * partials, one shuffle each on the window×type key — bounded-axis
    * output); the reconcile join runs on the aggregate frames (window
    * count × event types, orders of magnitude below the fact table).
    * Exactness: integer cents end-to-end — no float accumulation to
    * drift between the streaming and batch sides.
    */
  def streamBackfillReconcile(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val replayAgg = eventsReadStreamSlicedFull(spark, dir, 3)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_new"), sum(col("cents")).as("cents_new"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_new"), col("cents_new"))
    val replay = drainToTable(spark, replayAgg, queryName, "complete")
    val stored = graft.Tables.events(spark, dir)
      .filter(col("event_id") % 20 =!= 0)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_old"),
        sum((col("value").cast(DecimalType(12, 2)) * 100).cast(LongType))
          .as("cents_old"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_old"), col("cents_old"))
    replay.join(stored, Seq("w_start", "event_type"), "left")
      .select(col("w_start"), col("event_type"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("cents_old"), lit(0L)).as("cents_old"),
        col("n_new"), col("cents_new"))
      .withColumn("verdict",
        when(col("n_old") === 0, lit("added"))
          .when(col("n_old") === col("n_new") &&
            col("cents_old") === col("cents_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** STREAM-STATIC INGEST-TIME DECONTAMINATION — every arriving training
    * document's trigrams are checked against a BROADCAST eval-set gram
    * dimension, the shape a crawl pipeline runs so contaminated docs are
    * flagged BEFORE storage. Stream-static joins are STATELESS by
    * construction (no watermark, no state store, no output-mode
    * constraint): each microbatch is a map-side hash join against the
    * broadcast dim, so per-batch cost is O(batch grams) and state is
    * zero — the cheapest possible streaming operator shape. The emitted
    * (doc_id, ng, eval_id) hit stream is the raw decontamination
    * evidence; consumers aggregate it per doc (q278 holds that rollup to
    * q133's batch-oracle equality — streaming execution, batch answer).
    */
  def streamDecontamScreen(spark: SparkSession, dir: String,
      trainDocs: DataFrame, evalGrams: DataFrame,
      queryName: String): DataFrame = {
    val stream = docsReadStreamSliced(spark, dir,
      trainDocs.select(col("doc_id"), col("text")), 3, queryName)
    val grams = stream.select(col("doc_id"),
      explode(graft.expressions.ShingleStrings.shingleStrings(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("ng"))
    val hits = grams.join(broadcast(evalGrams), "ng")
      .select(col("doc_id"), col("ng"), col("eval_id"))
    drainToTable(spark, hits, queryName, "append")
  }

  /** STREAMING RATE LIMITER — fixed-window admission (the nginx/redis
    * shape): per (user, event-time hour) the first `limit` arrivals are
    * admitted, the rest rejected. flatMapGroupsWithState keyed on user;
    * state is the per-hour admitted count map — bounded by the hours a
    * user is active, NOT by event volume (one Int per active hour). In
    * production the stream arrives roughly time-ordered and a watermark
    * evicts hours behind the horizon; the gate's event_id-residue
    * slices revisit every hour in every batch, so the gate keeps the
    * full map (correctness over eviction — the production eviction is
    * a one-line timeout this harness cannot exercise honestly).
    * Arrival order is deterministic: slice files arrive in order, and
    * within a (user, batch) rows process in (ts_us, event_id) order —
    * so the batch oracle replays admission as a rank over (slice, ts,
    * event_id) within each (user, hour).
    */
  def streamRateLimit(spark: SparkSession, dir: String, limit: Int,
      queryName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = eventsReadStreamSlicedTs(spark, dir, slices = 3)
      .as[(Long, Long, Long)]
    val decided = stream.groupByKey(_._2)
      .flatMapGroupsWithState[Map[Long, Int], (Long, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[Map[Long, Int]]) =>
          var counts = state.getOption.getOrElse(Map.empty[Long, Int])
          val out = List.newBuilder[(Long, Long, Boolean)]
          rows.toList.sortBy(r => (r._3, r._1)).foreach {
            case (eid, _, tsUs) =>
              val hour = tsUs / 3600000000L
              val c = counts.getOrElse(hour, 0)
              val ok = c < limit
              if (ok) counts = counts.updated(hour, c + 1)
              out += ((eid, user, ok))
          }
          state.update(counts)
          out.result().iterator
      }
    drainToTable(spark, decided.toDF("event_id", "user_id", "allowed"),
      queryName, "append")
  }

  /** Stage the documents table as `slices` stream files by doc_id residue
    * — the documents twin of [[eventsReadStreamSliced]]; the near-dup
    * screen needs a genuinely multi-batch corpus stream so its band-key
    * state is exercised ACROSS batches.
    *
    * The staging dir keys on the CALLER's query name (drainToTable's
    * per-query discipline), not just (dir, slices): slice files are
    * written eagerly at construction but read lazily at stream start, so
    * two doc-stream queries staged to the same dir before either drains
    * — e.g. a %97 train subset and the full corpus, both 3 slices —
    * would silently read each other's data.
    */
  def docsReadStreamSliced(spark: SparkSession, dir: String,
      docs: DataFrame, slices: Int, name: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val streamDir = graft.util.Staging.dir(s"graft_docstream_s$slices", s"$dir#$name")
    stagedOnce(spark, s"spark.graft.layout.docstream_s$slices.$name", dir,
        java.nio.file.Paths.get(dir, "documents.parquet")) {
      Files.createDirectories(streamDir)
      (0 until slices).foreach { s =>
        val tmp = Files.createTempDirectory("graft_docslice")
        docs.filter(pmod(coalesce(col("doc_id"), lit(0L)), lit(slices.toLong)) === s)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(tmp).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        stageSliceOrdered(part, streamDir.resolve(s"slice$s.parquet"), s)
      }
    }
    spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
  }

  /** STREAMING NEAR-DUP SCREEN — ingest-time LSH dedup, the shape a
    * crawl pipeline runs so duplicates never reach storage: every
    * arriving document is MinHash-signed (32 slots over md5-derived
    * shingle hashes — the portable base, so a batch oracle can replay
    * every decision), exploded to 8×4 band keys, and checked against the
    * per-band-key state of everything already seen;
    * signature agreement ≥ 24/32 slots confirms (the streaming stand-in
    * for exact-Jaccard confirmation — state keeps signatures, never
    * documents). A flagged doc reports its earliest-seen partner.
    *
    * "Already seen" means ARRIVAL order — (slice, doc_id), since the
    * bounded stream replays doc_id-residue slices — which is exactly
    * what ingest-time dedup means: you can only dedup against what has
    * arrived. The batch oracle replays the same order, so cross-batch
    * state handoff is hash-gated (a pair split across batches flags iff
    * the state survived the boundary).
    *
    * Scale shape: state lives per band key (the q120 persisted-index
    * posture moved into the state store), holding (id, 32-slot sig) per
    * bucket occupant — bounded by bucket occupancy, with signatures ~256
    * bytes regardless of document size. Each batch shuffles once on the
    * band key. flatMapGroupsWithState keeps it on the state-store
    * executor path; nothing returns to the driver.
    */
  def streamNearDupScreen(spark: SparkSession, dir: String,
      docs: DataFrame, queryName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val slices = 3
    val stream = docsReadStreamSliced(spark, dir, docs, slices, queryName)
    val banded = stream
      .withColumn("sig", graft.expressions.MinHashSignature.minhashSignature(
        graft.functions.Similarity.md5ShingleHashes(
          graft.functions.Similarity.shingleSet(col("text"), 3)), 32))
      .select(col("doc_id"), col("sig"), explode(expr(
        "transform(sequence(0, 7), i -> struct(i AS band, " +
          "array_join(transform(slice(sig, i * 4 + 1, 4), " +
          "x -> CAST(x AS STRING)), ',') AS bkey))")).as("bk"))
      .select(
        concat(col("bk.band").cast(StringType), lit(":"), col("bk.bkey"))
          .as("gkey"),
        col("doc_id"), col("sig"))
      .as[(String, Long, Seq[Long])]
    val flagged = banded.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[List[(Long, Seq[Long])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[(Long, Long)]
          // within a batch, arrival order = doc_id (one slice per batch)
          rows.toList.sortBy(_._2).foreach { case (_, id, sig) =>
            val partners = seen.collect {
              case (pid, psig)
                if psig.iterator.zip(sig.iterator)
                  .count { case (a, b) => a == b } >= 24 => pid
            }
            if (partners.nonEmpty) out += ((id, partners.min))
            seen = (id, sig) :: seen
          }
          state.update(seen)
          out.result().iterator
      }
    drainToTable(spark, flagged.toDF("doc_id", "dup_partner"),
      queryName, "append")
  }

  /** Run the transformWithState totals over a 2-batch bounded stream and
    * return the FINAL per-user state: counts are monotone, so the max row
    * per user in the update-mode sink is the final accumulation.
    */
  def transformWithStateTotals(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = eventsReadStreamSliced(spark, dir, slices = 2)
        .select(col("user_id"), col("cents")).as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new TotalsProcessor, TimeMode.None(), OutputMode.Update())
      drainToTable(spark, stream.toDF(), queryName, "update")
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n_events"),
          (max(col("sum_cents")) / 100.0).as("sum_value"))
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** Streaming UPSERT SINK via foreachBatch — the production "stream into
    * a keyed table" pattern: each microbatch is reduced to its latest row
    * per key, then staged-upserted into a parquet target
    * ([[graft.store.ParquetStore]] — read-merge-swap, the same semantics
    * the JDBC store executes against a database). foreachBatch is the
    * bridge between Structured Streaming and any batch writer: the sink
    * logic is ordinary DataFrame code, retried per batch id. The per-key
    * merge assumes per-key event-time order across batches (file-replay
    * order here); an out-of-order source would version the upsert on a
    * sequence column (the [[graft.store.ApplyChangelog]] recipe).
    * Returns the final target state after draining the bounded stream.
    */
  /** STREAMING MATERIALIZED-VIEW MAINTENANCE — the streaming twin of the
    * batch base+delta merge (q171): each microbatch reduces to its
    * MERGEABLE partial state (count/sum/min/max cents per event_type) and
    * foreachBatch folds it into a VERSIONED parquet state — batch `b`
    * reads `state/v{b-1}` and writes `state/v{b}`, so a retried batch
    * rewrites its own version with identical content (idempotent merge =
    * exactly-once effect, the suite's replay-no-op sink discipline) and
    * the read side never overlaps the write side (no self-overwrite).
    * The bounded stream arrives as 3 file slices (`maxFilesPerTrigger=1`)
    * so the merge genuinely runs across multiple batches; the final state
    * must equal a one-pass batch aggregate — which is exactly what the
    * q187 oracle computes.
    *
    * At 100 TB the state frame is one row per group (tiny), each batch
    * touches only its delta, and the versioned-directory swap is the
    * poor-engine's transactional commit (a table format would do this
    * with a metadata pointer — same shape).
    */
  def streamAggMaintenance(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val root = graft.util.Staging.dir("graft_stream_viewmaint", dir)
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
    val stateRoot = root.resolve("state")
    Files.createDirectories(stateRoot)
    // typed slices: (event_id, event_type, cents) split by id residue
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
    val sliceDir = root.resolve("slices")
    Files.createDirectories(sliceDir)
    (0 until 3).foreach { s =>
      val tmp = Files.createTempDirectory("graft_vm_slice")
      // null-safe slice key (same contract as eventsReadStreamSliced): the
      // q187 oracle aggregates ALL events, so a NULL id may not drop out
      ev.filter(pmod(coalesce(col("event_id"), lit(0L)), lit(3L)) === s)
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      stageSliceOrdered(part, sliceDir.resolve(s"slice$s.parquet"), s)
    }
    @volatile var lastBatch = -1L
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(sliceDir.toString)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s2 = batch.sparkSession
        val delta = batch.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
            min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
        val prevDir = stateRoot.resolve(s"v${batchId - 1}")
        val prev =
          if (Files.exists(prevDir)) s2.read.parquet(prevDir.toString)
          else delta.limit(0)
        val merged = prev.unionByName(delta)
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"),
            min(col("min_cents")).as("min_cents"),
            max(col("max_cents")).as("max_cents"))
        merged.write.mode("overwrite")
          .parquet(stateRoot.resolve(s"v$batchId").toString)
        lastBatch = math.max(lastBatch, batchId)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    require(lastBatch >= 0, "stream produced no batches")
    spark.read.parquet(stateRoot.resolve(s"v$lastBatch").toString)
  }

  def streamUpsertSink(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.util.Staging.dir("graft_stream_upsert", dir)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    val target = root.resolve("state").toString
    val store = new graft.store.ParquetStore(target, Seq("user_id"))
    val q = eventsReadStream(spark, dir).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = graft.transform.Transforms.dedupKeyed(
          batch, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
          .select(
            col("user_id"), col("ts").as("last_ts"),
            col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            col("value").cast(DecimalType(12, 2)).cast(DoubleType).as("last_value"))
        store.upsert(latest)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(target)
  }

  /** Open-session state carried across microbatches by
    * [[customStateSessions]]: epoch-micros bounds plus exact cent-integer
    * value sum (long micros/cents, not Timestamp/Double, so the state
    * encoder is flat and the arithmetic exact).
    */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sumCents: Long)

  case class SessionRow(
      user_id: Long, s_start: java.sql.Timestamp, s_end: java.sql.Timestamp,
      n: Long, sum_value: Double)

  private def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** CUSTOM per-key streaming state (B18's `flatMapGroupsWithState`
    * surface): session windows re-implemented by hand — the same semantics
    * as [[sessionAgg]]'s built-in `session_window`, so the gate oracle can
    * replay it — with explicitly managed state and an EVENT-TIME TIMEOUT.
    *
    * This is the textbook sessionization shape (what the built-in
    * operator's state store does internally): per user, state holds the
    * SORTED LIST of gap-disjoint sessions still inside the watermark
    * horizon. Each batch, new events enter as singleton sessions and the
    * list re-merges by interval folding (session aggregates merge
    * additively), which handles late-but-within-watermark events landing
    * ANYWHERE — extending a session backward, forward, or BRIDGING two
    * previously-separate sessions — exactly as `session_window` would.
    * A session is emitted (and dropped from state) only when the
    * watermark passes its end: no earlier event can arrive to extend or
    * bridge it. Gap evidence alone is NOT sufficient under late data —
    * a late event can fuse two gap-separated sessions — so eviction is
    * purely watermark-driven, with `setTimeoutTimestamp` scheduling the
    * no-data flush. Bounded state on an unbounded stream, built manually.
    *
    * Value sums accumulate as exact cent integers (the DECIMAL(12,2)
    * recipe in state form); the final division is the one IEEE operation,
    * matching the oracle's decimal-sum-then-cast bit-for-bit.
    */
  /** Interval fold over start-sorted sessions: merge when the next starts
    * before the current session's window end (aggregates add; max() on
    * the end covers containment). A singleton "session" per event plus
    * this fold IS sessionization — and re-folding state ∪ new events
    * handles late arrivals that extend or BRIDGE existing sessions.
    */
  private[graft] def mergeSessions(
      items: Seq[OpenSession], gapUs: Long): List[OpenSession] =
    items.sortBy(_.startUs).foldLeft(List.empty[OpenSession]) {
      case (cur :: done, s) if s.startUs < cur.lastUs + gapUs =>
        OpenSession(cur.startUs, math.max(cur.lastUs, s.lastUs),
          cur.n + s.n, cur.sumCents + s.sumCents) :: done
      case (acc, s) => s :: acc
    }.reverse

  def customStateSessions(
      spark: SparkSession, dir: String, queryName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val GapUs = 30L * 60 * 1000000
    def toRow(userId: Long, s: OpenSession): SessionRow =
      SessionRow(userId, usToTs(s.startUs), usToTs(s.lastUs + GapUs),
        s.n, s.sumCents / 100.0)

    def fn(
        userId: Long,
        events: Iterator[(Long, java.sql.Timestamp, Long, Long)],
        state: GroupState[Seq[OpenSession]]): Iterator[SessionRow] = {
      val incoming = events
        .map { case (_, _, tsu, cents) => OpenSession(tsu, tsu, 1, cents) }
        .toSeq
      val merged = mergeSessions(state.getOption.getOrElse(Seq.empty) ++ incoming, GapUs)
      // evict strictly below the watermark — the same strict compare the
      // timeout trigger uses (timeout fires when timeoutTs < watermark),
      // so emission is consistent across groups (ms precision — the
      // GroupState API speaks millis)
      val wm = state.getCurrentWatermarkMs()
      val (closed, open) = merged.partition(s => (s.lastUs + GapUs) / 1000 < wm)
      if (open.nonEmpty) {
        state.update(open)
        // next flush at the earliest remaining session end; the API
        // requires a timestamp strictly beyond the current watermark
        state.setTimeoutTimestamp(math.max(open.map(s => (s.lastUs + GapUs) / 1000).min, wm + 1))
      } else {
        state.remove()
      }
      closed.iterator.map(toRow(userId, _))
    }

    val sessions = eventsReadStream(spark, dir)
      .withWatermark("ts", "1 hour")
      // the watermarked ts column must SURVIVE the projection feeding the
      // stateful operator (dropping it fails analysis: "Watermark must be
      // specified"); micros ride alongside for exact state arithmetic
      .select(
        col("user_id").cast(LongType),
        col("ts"),
        unix_micros(col("ts")),
        // exact cents (the DECIMAL(12,2) cast in integer form)
        round(col("value") * 100).cast(LongType))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
    drainToTable(spark, sessions.toDF(), queryName, "append")
  }

  /** Stream-stream INTERVAL join, production posture: purchases joined to
    * the clicks that preceded them by < 1 hour, both sides watermarked so
    * join state is evicted once the watermark passes the interval bound —
    * bounded state on an unbounded stream. On the bounded gate input every
    * match is emitted (all rows precede the first watermark advance), so
    * the result equals the batch interval join and a SQL oracle can replay
    * it exactly.
    */
  def streamStreamIntervalJoin(
      spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val purchases = eventsReadStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val clicks = eventsReadStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id").as("c_user"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val joined = purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") < col("pts"))
      .select(col("user_id"), col("p_event"), col("pts"), col("c_event"), col("cts"))
    drainToTable(spark, joined, queryName, "append")
  }

  /** Stream-stream LEFT OUTER interval join — the null-extension
    * semantics on top of [[streamStreamIntervalJoin]]'s shape: a purchase
    * with no preceding click emits a null-extended row, but only once the
    * watermark PROVES no matching click can still arrive (outer results
    * are watermark-driven in append mode — Spark evicts the purchase from
    * join state and emits the null row in the no-data batch that follows
    * the final watermark advance). Matched rows emit as they join,
    * exactly like the inner form.
    */
  def streamStreamLeftOuterJoin(
      spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val purchases = eventsReadStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val clicks = eventsReadStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id").as("c_user"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val joined = purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") < col("pts"),
        "leftOuter")
      .select(col("user_id"), col("p_event"), col("pts"), col("c_event"), col("cts"))
    drainToTable(spark, joined, queryName, "append")
  }
}
