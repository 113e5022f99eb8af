package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-shingle hashes straight from a token array, in [0, 2^31-1) —
  * the MinHash input — without materializing shingle STRINGS. Each token is
  * xxhash64'd once (seed 42, Spark's constant), windows combine token
  * hashes with a multiply-add roll, and the result is deduplicated.
  *
  * Replaces the interpreted transform(sequence)→concat_ws→xxhash64→
  * array_distinct chain: one pass, no string allocation, HashSet dedup.
  * Shingle IDENTITY is hash-based rather than string-based — fine for LSH
  * candidate generation and hash-set Jaccard (64-bit collision probability
  * over a corpus is negligible), used only in oracle-free queries.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private final val P = 2147483647L
  private final val Mix = -7046029254386353131L // golden-ratio odd constant

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    val seen = new mutable.LongMap[Unit](math.max(4, n))
    val out = mutable.ArrayBuilder.make[Long]
    val windows = math.max(1, n - k + 1)
    var w = 0
    while (w < windows) {
      var h = 0L
      var j = 0
      val kk = math.min(k, n - w)
      while (j < kk) { h = h * Mix + th(w + j); j += 1 }
      val v = ((h % P) + P) % P
      if (!seen.contains(v)) { seen.update(v, ()); out += v }
      w += 1
    }
    new GenericArrayData(out.result())
  }

  // interpreted eval is already allocation-light; fall back to it from
  // generated code to keep one implementation (still one virtual call per
  // row, not per element)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingle", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $self.evalArray($arr);")
  }

  /** Bridge for generated code. */
  def evalArray(input: ArrayData): ArrayData =
    nullSafeEval(input).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def shingleHashes(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(tokens), k))
}
