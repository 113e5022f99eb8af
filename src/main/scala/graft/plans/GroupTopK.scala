package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (SURVEY §7 / guide level (c)): top-k rows per
  * key as a first-class operator — logical node → strategy → physical
  * exec, registered library-grade through [[GraftExtensions]]
  * (SparkSessionExtensions; `experimental.extraStrategies` remains as the
  * ad-hoc fallback in [[GroupTopK.topKPerGroup]]), with [[TopKRewrite]]
  * rewriting plain window-top-k user code onto it automatically.
  *
  * Why an operator and not a window: `row_number().over(partitionBy(k)
  * .orderBy(o)) <= k` must SORT every key group in full. This plans as
  * partial heap → key exchange → final heap: the map-side partial prunes
  * the shuffle to ≤ k rows per key per mapper (the combiner posture of a
  * hash aggregate), and the final keeps a bounded heap of k rows per key —
  * one shuffle, O(n log k) per partition, no sort buffers. At 100 TB with
  * millions of groups this is the difference between a heap per key and
  * sorting the whole table. Memory story: heap state is capped at
  * `spark.graft.topk.maxRowsInMemory` retained rows per partition; past
  * the cap the operator degrades to a DISK-SPILLABLE sort + rank walk
  * (the window shape), so a pathological key cardinality slows down
  * instead of OOMing.
  *
  * Output = child columns + `rn` (1-based rank within the key).
  */
case class GroupTopKNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    // constructor param (not a body val) so tree copies KEEP the exprId —
    // a fresh rn attribute per copy would orphan downstream references
    rnAttr: AttributeReference =
      AttributeReference("rn", IntegerType, nullable = false)()) extends UnaryNode {
  require(k >= 1, s"GroupTopK requires k >= 1, got $k") // empty heap would NPE in the exec
  override def output: Seq[Attribute] = child.output :+ rnAttr
  // rn is PRODUCED here, not read from the child — without this,
  // CheckAnalysis counts it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

case class GroupTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr :: Nil)

  // one hash shuffle on the grouping keys; no ordering requirement — the
  // heap does the per-key selection
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Soft cap on per-partition heap state: above this many retained rows
    * (groups × ≤k) the operator falls back to a SPILLABLE sort — the heap
    * map is unbounded otherwise and a high-cardinality key would OOM the
    * executor. Session-configurable for tests and tuning.
    */
  private def maxRowsInMemory: Int =
    conf.getConfString("spark.graft.topk.maxRowsInMemory", (1 << 22).toString).toInt

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val budget = maxRowsInMemory.max(kk + 1)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val (heaps, overBudget) =
        GroupTopK.accumulateHeaps(iter, keyProj, ordering, kk, budget)
      val outProj = UnsafeProjection.create(output, output)
      if (!overBudget) {
        val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
        heaps.forEach { (_, heap) =>
          val rows = new Array[InternalRow](heap.size)
          var i = heap.size - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // worst pops first
          var r = 0
          while (r < rows.length) {
            val joined = new JoinedRow(rows(r), InternalRow(r + 1))
            out += outProj(joined).copy()
            r += 1
          }
        }
        out.iterator
      } else {
        // SPILLABLE fallback: too many groups for in-memory heaps. The
        // rows already retained are a correct candidate superset (a heap
        // only ever discards rows beaten by k better rows of the same
        // key), so retained + the unread remainder feed a disk-backed
        // sort on (keys asc, order), then rank-walk emits ≤ k per key.
        // This is the window-function execution shape — slower, bounded.
        val keySort = keyExprs.map(SortOrder(_, Ascending))
        val fullOrdering =
          new LazilyGeneratedOrdering(keySort ++ sortOrder, childOutput)
        val retainedRows = {
          val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          heaps.forEach { (_, heap) =>
            while (!heap.isEmpty) buf += heap.poll()
          }
          heaps.clear()
          buf.iterator
        }
        val all = retainedRows ++ iter.map(_.copy())
        val sorted = org.apache.spark.graft.GraftSpillBridge
          .sortedWithSpill(all, fullOrdering)
        // group boundaries via the KEY ORDERING, not binary row equality:
        // contiguity is only guaranteed up to ordering-equality, and a key
        // type whose ordering-equal values are not binary-equal would
        // otherwise interleave and reset the rank mid-group (UnsafeWriter
        // normalizes NaN/-0.0, but the sort-consistent compare holds for
        // every orderable type by construction)
        val keyOrdering = new LazilyGeneratedOrdering(keySort, childOutput)
        new Iterator[InternalRow] {
          private var curKeyRow: InternalRow = null
          private var rank = 0
          private var nextRow: InternalRow = null
          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && sorted.hasNext) {
              val row = sorted.next()
              if (curKeyRow == null || keyOrdering.compare(curKeyRow, row) != 0) {
                curKeyRow = row.copy(); rank = 0
              }
              rank += 1
              if (rank <= kk) nextRow = row
            }
          }
          advance()
          override def hasNext: Boolean = nextRow != null
          override def next(): InternalRow = {
            val r = outProj(new JoinedRow(nextRow, InternalRow(rank))).copy()
            advance()
            r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}

/** Map-side partial top-k — the combiner half of the operator. BEFORE the
  * key exchange, each input partition keeps only its LOCAL top-k rows per
  * key: a superset of the global per-key top-k (a row outside its
  * partition's local top-k is beaten by k rows that all reach the reducer
  * with it), so the final pass computes identical results while the
  * shuffle carries at most k·(keys present) rows per mapper instead of
  * every input row — the same reason hash aggregates partial-aggregate
  * map-side. Over the per-partition state budget it degrades to
  * pass-through: partial pruning is an optimization, never a correctness
  * requirement.
  */
case class GroupTopKPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def maxRowsInMemory: Int =
    conf.getConfString("spark.graft.topk.maxRowsInMemory", (1 << 22).toString).toInt

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val budget = maxRowsInMemory.max(kk + 1)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val (heaps, overBudget) =
        GroupTopK.accumulateHeaps(iter, keyProj, ordering, kk, budget)
      val pruned = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.forEach { (_, heap) => heap.forEach(r => pruned += r) }
      // over budget: ship the retained superset plus the unread remainder —
      // the final pass (which CAN spill) does the real selection
      if (overBudget) pruned.iterator ++ iter else pruned.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKPartialExec =
    copy(child = newChild)
}

object GroupTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(keys, order, k, child, rnAttr) =>
      // final over partial; EnsureRequirements inserts the key exchange
      // between them (final declares ClusteredDistribution), so the
      // shuffle reads the partial's pruned output
      GroupTopKExec(keys, order, k, rnAttr,
        GroupTopKPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** The shared per-partition heap pass of both execs: per key, a bounded
    * "worst-first" heap of the k best rows. Returns the heaps plus whether
    * the retained-row budget was exceeded (the input iterator then still
    * holds the unread remainder — each exec decides its own degraded mode:
    * spillable sort for the final, pass-through for the partial).
    */
  private[plans] def accumulateHeaps(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int,
      budget: Long): (java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]], Boolean) = {
    val heaps = new java.util.HashMap[InternalRow,
      java.util.PriorityQueue[InternalRow]]()
    val worstFirst = ordering.reversed()
    var retained = 0L
    var overBudget = false
    while (iter.hasNext && !overBudget) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) { heap.add(row.copy()); retained += 1 }
      else if (ordering.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
      if (retained > budget) overBudget = true
    }
    (heaps, overBudget)
  }

  /** Register the strategy (idempotent) and build the operator over `df`:
    * top `k` rows per `keys`, best-first by `orderCol` descending with
    * `tieCol` ascending as the deterministic tie-break.
    */
  def topKPerGroup(
      df: DataFrame,
      keyCols: Seq[String],
      orderDescCol: String,
      tieAscCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n"))
    val keys = keyCols.map(attr)
    // pre-resolved against the child so the node is born resolved
    val order = Seq(
      SortOrder(attr(orderDescCol), Descending),
      SortOrder(attr(tieAscCol), Ascending))
    GraftColumnBridge.dataset(spark, GroupTopKNode(keys, order, k, child))
  }
}
