package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness (driver contract): runs every registered
  * query at SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and
  * total seconds.
  *
  * Timing methodology: each query is materialized through the `noop` sink —
  * unlike `count()`, which lets Catalyst prune projections/sorts out of the
  * plan, noop executes the full physical plan and discards rows at the
  * writer, so the numbers reflect real operator cost. A small warmup query
  * absorbs first-action JVM/codegen startup so per-query numbers are
  * steady-state.
  *
  * Each query is timed `SPARK_GRAFT_REPEATS` times (default 2) and the MIN
  * is reported: the min is the contention-robust statistic — a one-off
  * noisy-neighbor run can only inflate a single repeat, never the minimum
  * (round 2's harness recorded 17.3 s for a query that cleanly runs in
  * 0.57 s because something else held the box during the single repeat).
  * Short queries (best < 2.5 s) are extended to at least 3 repeats: their
  * numbers are proportionally the most contention-sensitive — rounds 5 and
  * 6 each flagged code-unchanged short queries as >2–3× "regressions" that
  * were pure scheduler noise (all recovered on re-run) — and the extra
  * repeats cost seconds in total. The cutoff sat at 1.0 s through round 6;
  * q38/q11 flapped just above it, hence 2.5 s.
  *
  * SELF-CERTIFICATION (round 10): min-of-repeats defends against one-off
  * spikes but not SUSTAINED box contention — round 9's driver bench
  * recorded a phantom 2.15× "regression" (91% of queries slower, worst
  * offenders code-unchanged) that an idle re-run fully dissolved, and the
  * artifact itself carried no way to tell. So the harness now interleaves
  * a fixed CALIBRATION PROBE (the q01 pricing aggregate, min of 2 runs —
  * one-off-spike-robust, sustained-load-sensitive) before the first query
  * and after every ~20, and emits the probe series in the JSON:
  * `calibration` (seconds per checkpoint), `calibration_drift`
  * (max/min over the series), and `contended: true` when drift exceeds
  * 1.5× — the run certifies or indicts itself, no re-run needed to
  * adjudicate. Methodology in PLANS.md §Bench.
  *
  * PER-QUERY REGRESSION GATE (round 11): the probe certifies the box, the
  * regression gate certifies the queries — each timing is diffed against
  * the committed prior `bench.json` (env `SPARK_GRAFT_PREV_BENCH`
  * overrides the path), and >2× drift with a 1 s absolute floor on an
  * UNCONTENDED run is emitted under `regressions` in the JSON. Contended
  * runs skip the gate (the calibration flag already voids their numbers,
  * and flagging queries there would recreate round 9's phantom
  * regressions).
  */
object Bench {

  /** Parse the per-query seconds out of a prior bench.json (our own output
    * format — the `"queries":{...}` object). Returns empty when the file is
    * absent/unreadable, so a first run simply has no regression baseline.
    */
  private[graft] def priorTimes(path: java.nio.file.Path): Map[String, Double] =
    try {
      val txt = java.nio.file.Files.readString(path)
      val start = txt.indexOf("\"queries\":{")
      if (start < 0) Map.empty
      else {
        val body = txt.substring(start + 11, txt.indexOf('}', start))
        raw""""([A-Za-z0-9_]+)":([0-9][0-9.eE+-]*)""".r
          .findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Exception => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "2").toInt.max(1)
    // PER-QUERY REGRESSION GATE (round 11): the calibration probe certifies
    // the BOX; this certifies the QUERIES. The committed bench.json from
    // the prior round is read BEFORE this run overwrites it, and any query
    // that got >2x slower (with a 1 s absolute floor — sub-second timings
    // drift multiples on scheduler noise alone) lands in `regressions`.
    // The gate only adjudicates on an uncontended run: a contended box
    // inflates everything and the calibration flag already indicts the
    // totals, so flagging queries there would be the round-9 phantom all
    // over again.
    val prevBenchPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PREV_BENCH", "bench.json"))
    val prior = priorTimes(prevBenchPath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // tz-naive testdata timestamps must read as TIMESTAMP, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: absorb JVM/codegen startup with the limit(1) action plus
    // two FULL probe-query runs — the alphabetically-first measured
    // queries and calibration checkpoint #1 must already be steady-state
    // (round 10: on an otherwise-idle box, probe #1 read 1.7x its steady
    // value from pure JIT, indistinguishable from early contention in
    // the drift statistic; q01–q03 carried the same cold-start tax)
    run(queries.Relational.q01Pricing(spark, sfDir).limit(1))
    run(queries.Relational.q01Pricing(spark, sfDir))
    run(queries.Relational.q01Pricing(spark, sfDir))

    // calibration probe: a fixed cheap query timed at checkpoints through
    // the run; its drift is the box-contention signal (see header)
    val calib = scala.collection.mutable.ArrayBuffer.empty[Double]
    def probe(): Unit = {
      var best = Double.MaxValue
      var p = 0
      while (p < 2) {
        val t0 = System.nanoTime()
        run(queries.Relational.q01Pricing(spark, sfDir))
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        p += 1
      }
      calib += best
      System.err.println(f"[bench] calibration#${calib.size}%-14d $best%8.2fs")
    }
    probe()

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    var sinceProbe = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // every repeat runs (a flaky first attempt still surfaces); the
      // reported time is the min over SUCCESSFUL repeats only, so a
      // crash's time-to-throw never reads as a fast success. A query with
      // zero successes reports the min time-to-throw and lands in failed[]
      var bestOk = Double.MaxValue
      var bestAny = Double.MaxValue
      var successes = 0
      var r = 0
      // short-query tier: noise dominates, so guarantee >=3 repeats
      var target = repeats
      while (r < target) {
        val t0 = System.nanoTime()
        val ok =
          try { run(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED (repeat ${r + 1}): ${e.getMessage}")
            false
          }
        val secs = (System.nanoTime() - t0) / 1e9
        if (secs < bestAny) bestAny = secs
        if (ok) { successes += 1; if (secs < bestOk) bestOk = secs }
        r += 1
        if (r == target && successes > 0 && bestOk < 2.5 && target < 3)
          target = 3
      }
      if (successes == 0) failed += name
      val best = if (successes > 0) bestOk else bestAny
      System.err.println(f"[bench] $name%-24s $best%8.2fs (min of $successes/$target ok)")
      sinceProbe += 1
      if (sinceProbe >= 20) { sinceProbe = 0; probe() }
      name -> best
    }
    if (sinceProbe > 0) probe() // close the series at end-of-run
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failures are carried in the JSON itself
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // repeats_short only appears when the extension tier can actually fire
    // (repeats < 3); with repeats >= 3 no query gets extra runs
    val shortTier = if (repeats < 3) ""","repeats_short":3,"short_cutoff_sec":2.5""" else ""
    val drift = calib.max / calib.min
    val contended = drift > 1.5
    val calibJson = calib.map(v => f"$v%.4f").mkString("[", ",", "]")
    if (contended)
      System.err.println(f"[bench] WARNING: calibration drift $drift%.2fx > 1.5x" +
        " - box was contended during this run; totals are not comparable")
    val regressions =
      if (contended) Seq.empty
      else results.flatMap { case (name, secs) =>
        prior.get(name).collect {
          case p if secs > 2 * p && secs - p > 1.0 =>
            (name, p, secs)
        }
      }
    regressions.foreach { case (n, p, c) =>
      System.err.println(f"[bench] REGRESSION $n: $p%.2fs -> $c%.2fs")
    }
    val regJson = regressions.map { case (n, p, c) =>
      f"""{"query":"$n","prior":$p%.4f,"current":$c%.4f}"""
    }.mkString("[", ",", "]")
    val regBase =
      if (prior.isEmpty) "null" else "\"" + prevBenchPath.toString + "\""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"repeats":$repeats$shortTier,"calibration":$calibJson,"calibration_drift":${f"$drift%.4f"},"contended":$contended,"regressions":$regJson,"regression_baseline":$regBase,"sf":"$sfDir"}"""
    // stop Spark BEFORE printing the contract line: shutdown logging must
    // not land after (or interleave with) the JSON, which consumers parse
    // from the tail of stdout. A file copy is kept as a robust fallback.
    spark.stop()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json)
    println(json)
    System.out.flush()
  }
}
