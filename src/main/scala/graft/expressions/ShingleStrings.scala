package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-word shingle STRINGS from a token array — exactly
  * [[graft.functions.Similarity.shingleSet]] semantics (space-joined
  * windows, whole text as one shingle when shorter than k, first-occurrence
  * dedup) as a single native pass. Oracle-safe: produces the identical
  * strings the DuckDB oracle builds with `toks[i] || ' ' || …`.
  * With `distinct = false`, every window is emitted in order WITH
  * duplicates — the occurrence stream frequency statistics need (the
  * interpreted `transform(sequence(...))` alternative was a 10×
  * hotspot, the same CodegenFallback wall MinHashSignature removes).
  */
case class ShingleStrings(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ts(i) = toks.getUTF8String(i); i += 1 }
    val seen = new mutable.HashSet[UTF8String]
    val out = mutable.ArrayBuilder.make[UTF8String]
    val windows = math.max(1, n - k + 1)
    var w = 0
    while (w < windows) {
      val kk = math.min(k, n - w)
      val parts = new Array[UTF8String](kk)
      var j = 0
      while (j < kk) { parts(j) = ts(w + j); j += 1 }
      val sh = UTF8String.concatWs(space, parts: _*)
      if (!distinct || seen.add(sh)) out += sh
      w += 1
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleStr", this, classOf[ShingleStrings].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $self.evalArray($arr);")
  }

  def evalArray(input: ArrayData): ArrayData =
    nullSafeEval(input).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {
  def shingleStrings(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleStrings(GraftColumnBridge.expression(tokens), k))

  /** All windows in order, duplicates kept — the occurrence stream. */
  def shingleOccurrences(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(
      ShingleStrings(GraftColumnBridge.expression(tokens), k, distinct = false))
}
