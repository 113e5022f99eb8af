package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over an array<bigint> of base hashes in
  * [0, 2^31-1): slot s holds min over shingles of (a_s·h + b_s) mod 2^31-1
  * with a_s = (s·2654435761 + 1) mod p, b_s = (s·40503 + 7) mod p — the
  * exact Carter-Wegman scheme of the declarative
  * [[graft.functions.Similarity.minhashSignature]], as one tight
  * O(slots·shingles) codegen'd loop.
  *
  * Why custom: higher-order array functions evaluate interpreted
  * (CodegenFallback); the declarative form costs ~10⁸ lambda dispatches on a
  * few thousand documents and dominated the benchmark (30s of a 78s total).
  * This expression removes that hotspot (~100× on the signature stage) while
  * producing identical signatures.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private final val P = 2147483647L

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      val a = (s * 2654435761L + 1L) % P
      val b = (s * 40503L + 7L) % P
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * arr.getLong(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      mins(s) = if (n == 0) 0L else m
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[$numHashes];
         |for (int $s = 0; $s < $numHashes; $s++) {
         |  final long $a = ($s * 2654435761L + 1L) % ${P}L;
         |  final long $b = ($s * 40503L + 7L) % ${P}L;
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $v = ($a * $arr.getLong($j) + $b) % ${P}L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $mins[$s] = ($n == 0) ? 0L : $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column entry point: minhash_signature(array<bigint>, k) → array<bigint>. */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(baseHashes), numHashes))
}
