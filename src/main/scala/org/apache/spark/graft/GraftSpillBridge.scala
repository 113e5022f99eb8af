package org.apache.spark.graft

import org.apache.spark.TaskContext
import org.apache.spark.util.CompletionIterator
import org.apache.spark.util.collection.ExternalSorter

/** Bridge into Spark's `private[spark]` spill machinery (the same sorter
  * that backs sortByKey/ExternalAppendOnlyMap): a disk-spillable sort of
  * arbitrary records under the running task's memory manager. Lives in the
  * org.apache.spark namespace solely for access; contains no Spark code.
  */
object GraftSpillBridge {

  /** Sort `records` by `ord`, spilling to disk under memory pressure.
    * Records must be serializable with the session serializer (UnsafeRow
    * is). Must run inside a task (uses TaskContext.get()).
    */
  def sortedWithSpill[T](records: Iterator[T], ord: Ordering[T]): Iterator[T] = {
    val context = TaskContext.get()
    require(context != null, "sortedWithSpill must run inside a Spark task")
    val sorter = new ExternalSorter[T, Any, Any](
      context, aggregator = None, partitioner = None, ordering = Some(ord))
    sorter.insertAll(records.map(r => (r, null)))
    context.taskMetrics().incMemoryBytesSpilled(sorter.memoryBytesSpilled)
    context.taskMetrics().incDiskBytesSpilled(sorter.diskBytesSpilled)
    // CompletionIterator alone leaks sorter memory + spill files if a
    // downstream operator short-circuits (limit/take never drains the
    // iterator); the task-completion hook guarantees release either way
    // (stop() is idempotent — Spark's own callers pair the two the same way)
    context.addTaskCompletionListener[Unit](_ => sorter.stop())
    CompletionIterator[T, Iterator[T]](
      sorter.iterator.map(_._1), sorter.stop())
  }
}
