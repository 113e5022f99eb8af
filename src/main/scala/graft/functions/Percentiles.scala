package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** EXACT per-group interpolated percentiles via DISTRIBUTED RANK — the
  * 100 TB replacement for the `percentile()` aggregate, which buffers and
  * sorts every group's values inside ≤(distinct groups) reducers (5 groups
  * ⇒ 5 reducers own the whole corpus, at any scale).
  *
  * Shape: ONE range exchange on (group, value) — partition count grows
  * with the DATA, not the group count, so a single giant group still
  * spreads over the whole cluster — a spillable within-partition sort, and
  * a streaming O(1)-memory local-rank pass. Everything downstream operates
  * on tiny frames: per-(partition, group) counts (P·G rows) windowed into
  * global-rank offsets, the ≤2·|ps|·G needed ranks picked via broadcast
  * joins, and the interpolation arithmetic itself.
  *
  * Exactness: global rank = prefix-count offset + local rank reproduces
  * the total order; the interpolation replicates `percentile`'s own
  * formula — pos = p·(n−1) over the sorted non-null values, result =
  * (⌈pos⌉−pos)·lo + (pos−⌊pos⌋)·hi with its early-outs — in the same IEEE
  * operation order, so results are BIT-equal to the aggregate's
  * (PercentilesSpec asserts exact equality, no tolerance).
  */
object Percentiles {

  /** @param ps percentile fractions, e.g. Seq(0.5, 0.9, 0.99); output gets
    *           one double column per entry named like "p50"/"p90"/"p99"
    *           (p·100, trailing zeros trimmed), plus `n` = COUNT(*).
    * @return one row per group: (groupCol, p…, …, n), unrounded doubles.
    */
  def exactPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0), s"bad ps: $ps")
    val spark = df.sparkSession
    import spark.implicits._

    def colName(p: Double): String = {
      // decimal-string arithmetic, not p*100 in doubles (0.99*100 is not 99
      // in IEEE and would leak into the column name)
      val s = new java.math.BigDecimal(java.lang.Double.toString(p))
        .multiply(new java.math.BigDecimal(100)).stripTrailingZeros.toPlainString
      "p" + s.replace(".", "_")
    }

    // the group key travels internally as a NON-NULL struct (null flag +
    // coalesced string): a raw null key would be dropped by every equi-join
    // below and would defeat the rank pass's change detection — while the
    // percentile() aggregate this operator must match treats null as an
    // ordinary group
    val gEnc = struct(
      col(groupCol).isNull.as("is_null"),
      coalesce(col(groupCol).cast(StringType), lit("")).as("s"))
    def gDec(c: org.apache.spark.sql.Column) =
      when(c.getField("is_null"), lit(null).cast(StringType))
        .otherwise(c.getField("s"))

    val vals = df.select(gEnc.as("g"), col(valueCol).cast(DoubleType).as("v"))
    // COUNT(*) per group (output contract) — partial-aggregated map-side,
    // the exchange carries one tiny row per (mapper, group)
    val nAll = df.groupBy(gEnc.as("g")).agg(count(lit(1)).as("n"))

    // the one full-data stage: range-partition on (group, value) — NOT on
    // the group alone — then sort within partitions (spillable) and stream
    // out per-(partition, group) local ranks with O(1) state
    val p = spark.sessionState.conf.numShufflePartitions
    val ranked = vals.filter(col("v").isNotNull)
      .repartitionByRange(p, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[((Boolean, String), Double)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var first = true
        var cur: (Boolean, String) = null
        var r = 0L
        it.map { case (g, v) =>
          if (first || g != cur) { cur = g; r = 0L; first = false }
          r += 1
          (pid, g, v, r)
        }
      }
      .toDF("pid", "g", "v", "local_rank")
      // the tuple encoder names the struct fields _1/_2 — rebuild with the
      // field names the downstream joins/decodes use
      .withColumn("g", struct(col("g._1").as("is_null"), col("g._2").as("s")))
      // materialize the ranked frame ONCE (round-16): the offset branch
      // and the probe branch both consume it, and although AQE reused the
      // range exchange, each branch still replayed the within-partition
      // SORT + streaming rank pass on the reused shuffle output. The
      // checkpoint makes the sort+rank structurally single-execution; pid
      // consistency between branches is trivial (both read the same RDD).
      // Stat erasure is harmless here — every downstream join is already
      // explicitly broadcast-hinted. Recomputed from parquet every call.
      .localCheckpoint(true)

    // P·G-row frame: counts per (partition, group) → per-group running
    // offsets (window over ≤P rows per group) and non-null totals.
    val counts = ranked.groupBy("pid", "g").agg(count(lit(1)).as("c"))
    val wOff = Window.partitionBy("g").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("pid"), col("g"), col("off"))
    val totals = counts.groupBy("g").agg(sum(col("c")).as("nn"))

    // 0-based target position pos = p·(nn−1); the bracketing global ranks
    // (1-based) are ⌊pos⌋+1 and ⌈pos⌉+1 — at most 2·|ps| rows per group
    val needed = totals
      .select(col("g"), col("nn"), explode(typedlit(ps)).as("p"))
      .withColumn("pos", col("p") * (col("nn") - 1).cast(DoubleType))
      .withColumn("lo", floor(col("pos")).cast(LongType) + 1)
      .withColumn("hi", ceil(col("pos")).cast(LongType) + 1)

    val neededRanks = needed
      .select(col("g"), explode(array(col("lo"), col("hi"))).as("grank"))
      .distinct()

    // pick the bracketing rows: broadcast the tiny rank list against the
    // ranked corpus — a filter-shaped join, no corpus shuffle
    val picked = ranked
      .join(broadcast(offsets), Seq("pid", "g"))
      .withColumn("grank", col("off") + col("local_rank"))
      .join(broadcast(neededRanks), Seq("g", "grank"))
      .select(col("g"), col("grank"), col("v"))

    // interpolate with the aggregate's own formula and early-outs
    // (Percentile.getPercentile): integral position or equal neighbors
    // return the lower value directly; otherwise
    // (⌈pos⌉−pos)·lo + (pos−⌊pos⌋)·hi — bit-equal, not just close
    val interp = needed
      .join(picked.select(col("g"), col("grank").as("lo"), col("v").as("lo_v")), Seq("g", "lo"))
      .join(picked.select(col("g"), col("grank").as("hi"), col("v").as("hi_v")), Seq("g", "hi"))
      .withColumn("pv",
        when(col("lo") === col("hi") || col("lo_v") === col("hi_v"), col("lo_v"))
          .otherwise(
            (ceil(col("pos")) - col("pos")) * col("lo_v") +
              (col("pos") - floor(col("pos"))) * col("hi_v")))

    val aggCols = ps.map(pp => max(when(col("p") === pp, col("pv"))).as(colName(pp)))
    val pivoted = interp.groupBy(col("g")).agg(aggCols.head, aggCols.tail: _*)

    // left join from the COUNT(*) side: an all-null group has no ranked
    // rows but still gets its output row (null percentiles, n > 0) —
    // exactly what the percentile() aggregate emits
    nAll.join(pivoted, Seq("g"), "left")
      .select((gDec(col("g")).as(groupCol) +: ps.map(pp => col(colName(pp)))) :+ col("n"): _*)
  }

  /** EXACT per-group WEIGHTED quantiles over integral values — the
    * distributed replacement for the "window-cumsum the whole corpus per
    * group" shape, whose single hash exchange on the group key puts one
    * task per group at any scale (a 3-value key ⇒ 3 tasks own 100 TB).
    *
    * Same posture as [[exactPercentiles]]: ONE range exchange on
    * (group, value) spreads even a single giant group across the cluster;
    * a spillable within-partition sort + an O(1)-state streaming pass
    * produce per-(partition, group) weight cumsums; the tiny P·G count
    * frame is windowed into prefix offsets; offsets and totals broadcast
    * back onto the ranked corpus, and the quantile row is picked by a
    * map-side-combined partial MIN — no second corpus shuffle anywhere.
    *
    * Fractions are exact rationals (num, den), compared in integer
    * arithmetic: the f-quantile is the least v whose cumulative weight cw
    * (over value-ascending order) satisfies cw·den ≥ tw·num. Tie order
    * within equal values provably cannot change the result: the threshold
    * crossing lands inside the same equal-value run under every
    * value-consistent order, and only the VALUE is emitted. Weights must
    * be positive; values/weights must keep cw·den and tw·num inside
    * Long (|Σw|·den < 2⁶³ — at cents-scale weights that holds past 10¹⁶
    * rows per group).
    *
    * NULL CONTRACT: rows whose value OR weight is null are dropped before
    * ranking — they contribute to neither the cumulative weights nor the
    * group total. This differs from the window-cumsum shape this operator
    * replaces (where a null-valued row's weight still lands in
    * `SUM(w) OVER (PARTITION BY g)` because nulls sort last): callers with
    * nullable inputs must pre-filter or pre-coalesce to pick their
    * semantics explicitly rather than inherit either default.
    *
    * @param fs (outputColumn, numerator, denominator) per fraction, e.g.
    *           ("median_cents", 1, 2).
    * @return one row per group: (groupCol as string, fs…, total_w).
    */
  def exactWeightedQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      fs: Seq[(String, Long, Long)]): DataFrame = {
    require(fs.nonEmpty && fs.forall { case (_, n, d) => d > 0 && n >= 0 && n <= d },
      s"bad fractions: $fs")
    val spark = df.sparkSession
    import spark.implicits._

    // same non-null struct key trick as exactPercentiles: keeps null
    // groups alive through the equi-joins and the rank pass
    val gEnc = struct(
      col(groupCol).isNull.as("is_null"),
      coalesce(col(groupCol).cast(StringType), lit("")).as("s"))
    def gDec(c: org.apache.spark.sql.Column) =
      when(c.getField("is_null"), lit(null).cast(StringType))
        .otherwise(c.getField("s"))

    val vals = df
      .select(gEnc.as("g"), col(valueCol).cast(LongType).as("v"),
        col(weightCol).cast(LongType).as("w"))
      .filter(col("v").isNotNull && col("w").isNotNull)

    val p = spark.sessionState.conf.numShufflePartitions
    val ranked = vals
      .repartitionByRange(p, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[((Boolean, String), Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var first = true
        var cur: (Boolean, String) = null
        var cum = 0L
        it.map { case (g, v, w) =>
          if (first || g != cur) { cur = g; cum = 0L; first = false }
          cum += w
          (pid, g, v, w, cum)
        }
      }
      .toDF("pid", "g", "v", "w", "local_cw")
      .withColumn("g", struct(col("g._1").as("is_null"), col("g._2").as("s")))
      // materialize ONCE (round-16) — see the note in exactPercentiles:
      // AQE's stage cache already shared the range exchange between the
      // offset branch and the probe branch, but each branch re-ran the
      // within-partition sort + streaming cumsum on the reused shuffle
      // output. The checkpoint makes the expensive pass structurally
      // single-execution (PercentilesSpec pins ExistingRDD + a single
      // range exchange); downstream joins keep their explicit broadcast
      // hints, so LogicalRDD stat erasure cannot demote them.
      .localCheckpoint(true)

    // P·G-row frame: per-(partition, group) weight sums → per-group prefix
    // offsets AND group totals on the SAME tiny rows (two windows over ≤P
    // rows per group — range-partition order IS ascending pid order), so
    // the corpus sees exactly ONE broadcast join.
    val counts = ranked.groupBy("pid", "g").agg(sum(col("w")).as("c"))
    val wOff = Window.partitionBy("g").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("g")
    val offsets = counts
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .withColumn("tw", sum(col("c")).over(wAll))
      .select(col("pid"), col("g"), col("off"), col("tw"))

    // broadcast the offset/total frame onto the corpus; the pick is a
    // partial-aggregated MIN over the qualifying suffix — map-side
    // combine leaves G rows on the final exchange
    val cum = ranked
      .join(broadcast(offsets), Seq("pid", "g"))
      .withColumn("cw", col("off") + col("local_cw"))
    val aggs = fs.map { case (name, num, den) =>
      min(when(col("cw") * den >= col("tw") * num, col("v"))).as(name)
    } :+ max(col("tw")).as("total_w")
    cum.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .select((gDec(col("g")).as(groupCol) +: fs.map(f => col(f._1))) :+
        col("total_w"): _*)
  }
}
