package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD) — the text-curation
  * pass that makes byte-level equality mean character-level equality:
  * exact dedup, shingle hashing, and vocabulary building all treat
  * composed "é" (U+00E9) and decomposed "e"+U+0301 as DIFFERENT tokens
  * unless the corpus is normalized first, and NFKC additionally folds
  * compatibility forms (ﬁ → fi, ² → 2) the way tokenizer pipelines
  * expect.
  *
  * A custom `Expression` (not a UDF): the normalization form is fixed at
  * plan time, the codegen path is one static `java.text.Normalizer` call
  * with no lambda dispatch or row boxing, and the expression composes
  * inside whole-stage codegen like any built-in string function.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"bad form: $form")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Column entry point: unicodeNormalize(string, "NFC"|"NFD"|"NFKC"|"NFKD"). */
  def unicodeNormalize(text: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(GraftColumnBridge.expression(text), form))
}
