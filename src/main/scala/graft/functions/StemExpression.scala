package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemmer as a native Catalyst expression (SURVEY.md §2.11: the one
  * scalar transform with no built-in composition, reference src/main.py:60).
  *
  * A codegen'd `UnaryExpression` instead of a Scala UDF so the stem call
  * stays inside whole-stage codegen: no UDF SerDe, no codegen fence, and the
  * surrounding `transform(tokens, …)` loop keeps running on UTF8String slices
  * without Row boxing.
  */
case class StemExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(PorterStemmer.stem(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.PorterStemmer.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StemExpression =
    copy(child = newChild)
}

object StemExpression {
  /** Column-level entry point: `stem($"word")`. */
  def stem(c: Column): Column =
    ColumnBridge.column(StemExpression(ColumnBridge.expression(c)))
}
