package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 32-bit keys into one 64-bit value:
  * bit i of `left` lands at position 2i, bit i of `right` at 2i+1.
  *
  * Sorting (or range-partitioning) a table by this value CLUSTERS it along
  * BOTH dimensions at once: rows close on the Z-curve are close in both
  * keys, so per-file min/max statistics become tight in both columns and a
  * predicate on EITHER dimension skips most files — the multi-column
  * data-skipping layout lever (the single-column analogue is a plain sort;
  * q83's partitioning is the coarse-grained cousin). A native codegen'd
  * expression: one tight 32-iteration bit loop per row, no boxing.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Int]
    val y = b.asInstanceOf[Int]
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  ${ev.value} |= (($a >>> $i) & 1L) << (2 * $i);
         |  ${ev.value} |= (($b >>> $i) & 1L) << (2 * $i + 1);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** zorder64(a: int, b: int) → bigint Morton code. */
  def zorder64(a: Column, b: Column): Column =
    GraftColumnBridge.column(InterleaveBits(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
