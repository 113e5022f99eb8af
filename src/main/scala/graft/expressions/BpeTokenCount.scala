package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The ONE greedy longest-match ("maximal munch") implementation both
  * subword expressions share: a vocabulary indexed by code-point length
  * (longest first) plus the single per-position step. [[BpeTokenCount]]
  * folds the step into a count; [[BpeSegment]] collects the pieces — so
  * the pinned invariant `size(bpeSegment) == bpeTokenCount` holds by
  * construction (one walk, two folds), not by parallel maintenance of two
  * copies of the walk.
  *
  * Matching is over CODE POINTS (UTF8String semantics), identical to
  * DuckDB's `substr`/`length`, so oracles replay the same walk with a
  * recursive CTE over the same vocab and hash-match exactly.
  */
final class BpeVocabIndex(vocab: Seq[String]) extends Serializable {
  require(vocab.nonEmpty, "empty vocabulary")

  val maxLen: Int = vocab.map(UTF8String.fromString(_).numChars()).max
  private val byLen: Array[java.util.HashSet[UTF8String]] = {
    val a = Array.fill(maxLen + 1)(new java.util.HashSet[UTF8String]())
    vocab.foreach { p =>
      val u = UTF8String.fromString(p)
      a(u.numChars()).add(u)
    }
    a
  }

  /** Length (in code points) of the piece consumed at `pos` in word `w`
    * of length `len`: the longest vocab piece matching there, or 1 (the
    * single-character UNK fallback) when none matches.
    */
  def munchLen(w: UTF8String, pos: Int, len: Int): Int = {
    var k = math.min(maxLen, len - pos)
    while (k >= 1) {
      if (!byLen(k).isEmpty && byLen(k).contains(w.substring(pos, pos + k)))
        return k
      k -= 1
    }
    1
  }
}

/** SUBWORD TOKEN COUNT via greedy longest-match segmentation — the
  * BPE/WordPiece-style tokenizer pass every training pipeline budgets
  * sequence lengths with, as one codegen'd projection. Each whitespace
  * word is segmented left-to-right by maximal munch against a vocabulary
  * of subword pieces: at every position the longest matching piece is
  * consumed (ties impossible — one longest length), and a position no
  * piece matches consumes a single character as UNK. The expression
  * returns the TOTAL subword count over the token array; an empty word
  * contributes 0.
  *
  * The vocabulary ships with the expression (serialized plan →
  * task-broadcast — the [[LinearTextScore]] posture; real BPE vocabs are
  * ~50k pieces ≈ sub-MB, comfortably plan-shippable). The walk itself is
  * [[BpeVocabIndex.munchLen]] — shared with [[BpeSegment]].
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "empty vocabulary")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val index = new BpeVocabIndex(vocab)

  override protected def nullSafeEval(input: Any): Any =
    evalCount(input.asInstanceOf[ArrayData])

  def evalCount(toks: ArrayData): Long = {
    val n = toks.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      val len = w.numChars()
      var pos = 0
      while (pos < len) {
        total += 1
        pos += index.munchLen(w, pos, len)
      }
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeCount", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.evalCount($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Column entry point: bpe_token_count(array<string>, vocab) → bigint. */
  def bpeTokenCount(tokens: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(
      BpeTokenCount(GraftColumnBridge.expression(tokens), vocab))
}

/** The SEGMENTATION itself — the same [[BpeVocabIndex.munchLen]] walk as
  * [[BpeTokenCount]], but returning the flat subword-piece SEQUENCE over
  * the whole token array (each word's pieces in order, words concatenated
  * left-to-right, no word-boundary markers). This is what subword-level
  * n-gram passes (q188's decontamination) shingle over: two texts that
  * whitespace-tokenize differently (hyphenation, joined words) still
  * produce identical piece runs wherever the underlying characters agree
  * within words. Counting invariant: `size(bpeSegment(t, v)) ==
  * bpeTokenCount(t, v)` for every input — by construction, since both
  * expressions take identical steps (ExpressionsSpec pins it anyway,
  * alongside the reconstruction law `array_join(bpeSegment(t, v)) =
  * concat(t)`).
  */
case class BpeSegment(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "empty vocabulary")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val index = new BpeVocabIndex(vocab)

  override protected def nullSafeEval(input: Any): Any =
    evalSegment(input.asInstanceOf[ArrayData])

  def evalSegment(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      val len = w.numChars()
      var pos = 0
      while (pos < len) {
        val step = index.munchLen(w, pos, len)
        out.add(w.substring(pos, pos + step))
        pos += step
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeSeg", this, classOf[BpeSegment].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $self.evalSegment($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object BpeSegment {
  /** Column entry point: bpe_segment(array<string>, vocab) → array<string>. */
  def bpeSegment(tokens: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(
      BpeSegment(GraftColumnBridge.expression(tokens), vocab))
}
