package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Maximum multiplicity of any element in a token array — the
  * top-token-count statistic of repetition quality filters (q78), as one
  * native per-row pass.
  *
  * Top-token share is a PER-DOCUMENT statistic: computing it relationally
  * (explode → (doc, token) count → per-doc max → join back) shuffles the
  * whole exploded token stream twice and joins it back onto the corpus —
  * three corpus-sized stages for a number each row can produce alone. This
  * expression folds it into whatever projection the pipeline already runs:
  * zero exchange, zero row amplification, same posture as
  * [[ShingleStrings]]/[[LinearTextScore]]. A doc's token count is bounded
  * by the row size, so the per-row hash map is small and short-lived.
  *
  * Returns 0 for an empty array (tokens() never produces one — whitespace
  * splitting a trimmed string yields at least [""]).
  */
case class MaxTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    evalMax(input.asInstanceOf[ArrayData])

  def evalMax(toks: ArrayData): Int = {
    val n = toks.numElements()
    val m = new mutable.HashMap[UTF8String, Int]
    var best = 0
    var i = 0
    while (i < n) {
      val c = m.getOrElse(toks.getUTF8String(i), 0) + 1
      m.update(toks.getUTF8String(i), c)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("maxTok", this, classOf[MaxTokenCount].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.evalMax($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxTokenCount =
    copy(child = newChild)
}

object MaxTokenCount {
  /** Column entry point: max_token_count(array&lt;string&gt;) → int. */
  def maxTokenCount(tokens: Column): Column =
    GraftColumnBridge.column(MaxTokenCount(GraftColumnBridge.expression(tokens)))
}
