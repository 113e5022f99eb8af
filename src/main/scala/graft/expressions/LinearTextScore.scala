package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-n-gram LINEAR TEXT SCORER — the fasttext-style quality
  * classifier's inference pass as one codegen'd projection: every word
  * n-gram (orders 1..maxNgram, space-joined) is feature-hashed into one of
  * `weights.length` buckets and the bucket weights are summed. No UDF, no
  * explode, no join — a document scores in a single tight loop over its
  * token array, so classifier scoring at 100 TB is a map-only stage that
  * rides whatever scan/partitioning the pipeline already has.
  *
  * The model ships with the expression (a few KB of int weights inside the
  * serialized plan — task-broadcast, the same posture as q42's centroid
  * frame): real fasttext buckets are 2M floats ≈ 8 MB, still
  * plan-shippable; beyond that the model belongs in an explicit
  * broadcast-join table instead.
  *
  * Feature hash: bucket = (first 4 md5 bytes of the n-gram, as an unsigned
  * 32-bit int) mod buckets — byte-identical to DuckDB's
  * `CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % B`, so integer-weight
  * models replay exactly in the oracle. The score stays an exact long; a
  * probability needs only the monotone σ(score·scale), so thresholding the
  * raw sum IS thresholding the sigmoid — gates compare the integer sum and
  * stay hash-exact (σ's exp() differs in the last ulp across engines).
  */
case class LinearTextScore(child: Expression, weights: Seq[Int], maxNgram: Int)
    extends UnaryExpression {
  require(weights.nonEmpty, "empty weight vector")
  require(maxNgram >= 1, "maxNgram must be >= 1")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val w: Array[Int] = weights.toArray
  @transient private lazy val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any =
    evalScore(input.asInstanceOf[ArrayData])

  def evalScore(toks: ArrayData): Long = {
    val n = toks.numElements()
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ts(i) = toks.getUTF8String(i); i += 1 }
    val md = MessageDigest.getInstance("MD5") // digest() self-resets per feature
    val b = w.length
    var score = 0L
    var k = 1
    while (k <= maxNgram) {
      var s = 0
      while (s + k <= n) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = ts(s + j); j += 1 }
        val h = md.digest(UTF8String.concatWs(space, parts: _*).getBytes)
        val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        score += w((v % b).toInt)
        s += 1
      }
      k += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("linScore", this, classOf[LinearTextScore].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.evalScore($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearTextScore =
    copy(child = newChild)
}

object LinearTextScore {
  /** Column entry point: linear_text_score(array<string>, w, maxNgram) → bigint. */
  def linearTextScore(tokens: Column, weights: Seq[Int], maxNgram: Int = 2): Column =
    GraftColumnBridge.column(
      LinearTextScore(GraftColumnBridge.expression(tokens), weights, maxNgram))
}
