package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed aggregators (B19) via the public
  * `org.apache.spark.sql.expressions.Aggregator` API — registered with
  * `functions.udaf`, they plan as ordinary (partial-merge-final) hash
  * aggregates, so they scale exactly like built-in aggregate functions.
  */
object Aggregators {

  case class VecBuf(sums: Array[Double], n: Long)

  /** Element-wise mean of equal-length vectors (embedding centroid). */
  object VecAvg extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: VecBuf, v: Seq[Double]): VecBuf =
      if (v == null) b
      else if (b.n == 0L) VecBuf(v.toArray, 1L)
      else {
        // fail fast on ragged input: silently truncating (or crashing only
        // when the longer row happens to arrive first) would make results
        // depend on partition order
        require(v.length == b.sums.length,
          s"VecAvg: vector length ${v.length} != ${b.sums.length}")
        var i = 0
        val s = b.sums
        while (i < s.length) { s(i) += v(i); i += 1 }
        VecBuf(s, b.n + 1L)
      }

    override def merge(a: VecBuf, b: VecBuf): VecBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sums.length == b.sums.length,
          s"VecAvg: vector length ${b.sums.length} != ${a.sums.length}")
        var i = 0
        val s = a.sums
        while (i < s.length) { s(i) += b.sums(i); i += 1 }
        VecBuf(s, a.n + b.n)
      }

    override def finish(b: VecBuf): Seq[Double] =
      if (b.n == 0L) Seq.empty else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Numerically-stable (Welford/Chan) sample variance. */
  case class VarBuf(n: Long, mean: Double, m2: Double)

  object WelfordVariance extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

    override def reduce(b: VarBuf, x: Double): VarBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      VarBuf(n, mean, b.m2 + d * (x - mean))
    }

    override def merge(a: VarBuf, b: VarBuf): VarBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        VarBuf(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }

    override def finish(b: VarBuf): Double =
      if (b.n < 2) Double.NaN else b.m2 / (b.n - 1)

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
