package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** DISTRIBUTED running total — the scalable replacement for
  * `sum(v).over(Window.partitionBy(lowCardKey).orderBy(...))`, whose hash
  * exchange hands each partition-key value to ONE task (a 5-value key ⇒ 5
  * tasks own the corpus at any scale).
  *
  * Classic two-pass parallel prefix sum, same scaffold as
  * [[Percentiles.exactWeightedQuantiles]]: ONE range exchange on
  * (partition keys, sort keys) — partition count grows with the data —
  * then a spillable within-partition sort, an O(1)-state streaming local
  * cumsum, per-(partition, group) sums windowed into prefix offsets over
  * the tiny P·G frame, and a broadcast join to add offset + local. All
  * payload columns ride through untouched (generic Row encoder).
  *
  * The value column must be integral (LongType after cast); a null value
  * contributes 0 to the running total (where the window aggregate would
  * emit null for an all-null prefix, this emits 0 — running TOTALS, not
  * null-bookkeeping). Null partition keys form their own group, exactly
  * like the window operator.
  */
object PrefixSum {

  /** @param partCols window partition keys (possibly low-cardinality)
    * @param sortCols within-group order, e.g. Seq(col("v").desc, col("id"))
    * @param valueCol LongType column to accumulate
    * @param outCol   name of the appended running-total column
    */
  def runningTotal(
      df: DataFrame,
      partCols: Seq[String],
      sortCols: Seq[Column],
      valueCol: String,
      outCol: String): DataFrame = {
    require(partCols.nonEmpty && sortCols.nonEmpty)
    // the internal scratch columns are fixed names — an input that already
    // carries one would be silently clobbered and then dropped
    val reserved = Seq("__gkey", "__pid", "__lcum", "__off", "__c")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns $clash collide with runningTotal's internal names $reserved")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions

    // group key as a join-safe struct (null flag + string): raw null keys
    // would fall out of the offsets equi-join below
    val gkey = struct(partCols.map(c =>
      struct(col(c).isNull.as("is_null"),
        coalesce(col(c).cast(StringType), lit("")).as("s")).as(c)): _*)

    val ordered = df
      .withColumn("__gkey", gkey)
      .repartitionByRange(p, partCols.map(col) ++ sortCols: _*)
      .sortWithinPartitions(partCols.map(col) ++ sortCols: _*)
      .withColumn("__pid", spark_partition_id())

    val base = ordered.schema
    require(base(valueCol).dataType == LongType,
      s"$valueCol must be LongType, is ${base(valueCol).dataType}")
    val vIdx = base.fieldIndex(valueCol)
    val gIdx = base.fieldIndex("__gkey")
    implicit val enc = Encoders.row(base.add("__lcum", LongType, nullable = false))
    // streaming local pass: rows arrive (group, sort)-ordered, so group
    // changes are contiguous — O(1) state, no buffering
    val local = ordered.mapPartitions { it =>
      var cur: Any = null
      var first = true
      var cum = 0L
      it.map { r =>
        val g = r.get(gIdx)
        if (first || g != cur) { cur = g; cum = 0L; first = false }
        if (!r.isNullAt(vIdx)) cum += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }

    // P·G-row frame: per-(partition, group) sums → per-group prefix
    // offsets (range-partition order IS ascending pid order). Summed over
    // the SAME local-pass subtree the probe side reads: asymmetric
    // branches over one exchange can get different AQE shuffle reads and
    // disagree on partition ids (verified failure mode — see the counts
    // note in Percentiles.exactPercentiles). Not a 2× corpus cost: AQE
    // reuses the range-exchange stage at runtime (ReusedExchange in the
    // executed plan — PrefixSumSpec asserts it), so one scan + one shuffle
    // feed both branches.
    val counts = local.groupBy(col("__pid"), col("__gkey"))
      .agg(sum(col(valueCol)).as("__c"))
    val wOff = Window.partitionBy("__gkey").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__gkey"), col("__off"))

    local.join(broadcast(offsets), Seq("__pid", "__gkey"))
      .withColumn(outCol, col("__off") + col("__lcum"))
      .drop("__pid", "__gkey", "__lcum", "__off")
  }

  /** DISTRIBUTED ADJACENT-RUN CENSUS over a total order (round-15
    * optimization, built for q369's encoding advisor): returns a ONE-ROW
    * frame `(n, runs)` where `n` is the row count and `runs` is the RLE
    * run count of `valueCol` in `sortCols` order — exactly
    * `1 + Σ [prev ≠ null ∧ v ≠ null ∧ v ≠ prev]` over the globally
    * sorted sequence (null runs are not counted as transitions, matching
    * the LAG-based formulation), and null when the input is empty.
    *
    * Replaces the rank-scaffold + shifted self-join the advisor used
    * (`runningTotal` to number rows, then rk ⋈ (rn+1) to pair neighbors
    * — two extra corpus exchanges per column): ONE range exchange in
    * sort order, an O(1)-state per-partition scan emitting a single
    * summary row (count, within-partition transitions, first/last
    * value), and a P-row stitch that adds one transition per
    * partition boundary whose adjacent values differ. The stitch window
    * runs over ≤ `numShufflePartitions` rows — constant-sized, never
    * corpus-sized. The sort order must be TOTAL (unique sort keys) for
    * the run count to be well-defined — same contract as the self-join
    * form. `valueCol` must be StringType (cast upstream, as the advisor
    * does).
    */
  def orderedRuns(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String): DataFrame = {
    require(sortCols.nonEmpty)
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ordered = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val base = ordered.schema
    require(base(valueCol).dataType == StringType,
      s"$valueCol must be StringType, is ${base(valueCol).dataType}")
    val vIdx = base.fieldIndex(valueCol)
    val pIdx = base.fieldIndex("__pid")
    val summarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__n", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__trans", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__first", StringType, nullable = true),
      org.apache.spark.sql.types.StructField("__last", StringType, nullable = true)))
    implicit val enc = Encoders.row(summarySchema)
    val perPart = ordered.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        var pid = -1
        var n = 0L
        var trans = 0L
        var first: String = null
        var firstSet = false
        var prev: String = null
        var hasPrev = false
        while (it.hasNext) {
          val r = it.next()
          pid = r.getInt(pIdx)
          val v = if (r.isNullAt(vIdx)) null else r.getString(vIdx)
          if (!firstSet) { first = v; firstSet = true }
          if (hasPrev && prev != null && v != null && v != prev) trans += 1
          prev = v; hasPrev = true; n += 1
        }
        Iterator(Row(pid, n, trans, first, prev))
      }
    }
    // boundary stitch over the tiny per-partition frame (<= p rows): the
    // previous NON-EMPTY partition's last value is simply lag() here,
    // because empty partitions emitted no summary row
    val w = Window.orderBy(col("__pid"))
    perPart
      .withColumn("__plast", lag(col("__last"), 1).over(w))
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        (sum(col("__trans")) +
          sum(when(col("__plast").isNotNull && col("__first").isNotNull &&
            col("__plast") =!= col("__first"), 1L).otherwise(0L)) + 1L)
          .as("runs"))
  }

  /** DISTRIBUTED EXCLUSIVE prefix-min — same two-pass scaffold as
    * [[runningTotal]], different monoid: `outCol` is the minimum of
    * `valueCol` over all STRICTLY PRECEDING rows of the group in sort
    * order, and NULL when no preceding row carries a value (the window
    * equivalent is `min(v).over(partitionBy(...).orderBy(...)
    * .rowsBetween(unboundedPreceding, -1))`, whose low-cardinality-key
    * exchange this replaces). The exclusive frame is what dominance-style
    * operators (skyline, strictly-better-than-any-predecessor screens)
    * need: a row must never suppress itself. Null values contribute
    * nothing; min is associative, so per-partition mins compose into
    * prefix offsets exactly like the sums do.
    */
  def runningMin(
      df: DataFrame,
      partCols: Seq[String],
      sortCols: Seq[Column],
      valueCol: String,
      outCol: String): DataFrame = {
    require(partCols.nonEmpty && sortCols.nonEmpty)
    val reserved = Seq("__gkey", "__pid", "__lmin", "__off", "__c")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns $clash collide with runningMin's internal names $reserved")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions

    val gkey = struct(partCols.map(c =>
      struct(col(c).isNull.as("is_null"),
        coalesce(col(c).cast(StringType), lit("")).as(c + "_s")).as(c)): _*)

    val ordered = df
      .withColumn("__gkey", gkey)
      .repartitionByRange(p, partCols.map(col) ++ sortCols: _*)
      .sortWithinPartitions(partCols.map(col) ++ sortCols: _*)
      .withColumn("__pid", spark_partition_id())

    val base = ordered.schema
    require(base(valueCol).dataType == LongType,
      s"$valueCol must be LongType, is ${base(valueCol).dataType}")
    val vIdx = base.fieldIndex(valueCol)
    val gIdx = base.fieldIndex("__gkey")
    implicit val enc = Encoders.row(base.add("__lmin", LongType, nullable = true))
    // streaming local pass, EXCLUSIVE: emit the pre-row state, then fold
    // the row's value in — O(1) state like the cumsum pass
    val local = ordered.mapPartitions { it =>
      var cur: Any = null
      var first = true
      var m: java.lang.Long = null
      it.map { r =>
        val g = r.get(gIdx)
        if (first || g != cur) { cur = g; m = null; first = false }
        val out = Row.fromSeq(r.toSeq :+ m)
        if (!r.isNullAt(vIdx)) {
          val v = r.getLong(vIdx)
          m = if (m == null || v < m) v else m
        }
        out
      }
    }

    // per-(partition, group) mins → exclusive per-group prefix offsets
    // over the tiny P·G frame; aggregated from the SAME local subtree the
    // probe reads (the AQE branch-symmetry rule — see runningTotal)
    val counts = local.groupBy(col("__pid"), col("__gkey"))
      .agg(min(col(valueCol)).as("__c"))
    val wOff = Window.partitionBy("__gkey").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", min(col("__c")).over(wOff))
      .select(col("__pid"), col("__gkey"), col("__off"))

    local.join(broadcast(offsets), Seq("__pid", "__gkey"))
      // least() skips nulls: null offset (first partition) or null local
      // state (first row) degrade to the other side; both null = no
      // predecessor at all
      .withColumn(outCol, least(col("__off"), col("__lmin")))
      .drop("__pid", "__gkey", "__lmin", "__off")
  }
}
