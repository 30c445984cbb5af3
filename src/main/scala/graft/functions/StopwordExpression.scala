package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** O(1) stopword membership as a codegen'd expression.
  *
  * `t.isin(stopwords: _*)` inside an array lambda compiles to a 179-branch
  * `In` evaluated per token — O(|list|) per token and a codegen blowup. This
  * is a static HashSet<UTF8String> probe: one hash lookup, no string
  * decoding. Semantics identical (case-SENSITIVE, the reference's quirk).
  */
case class IsStopwordExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    IsStopwordExpr.Set.contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IsStopwordExpr.Set().contains($c)")

  override protected def withNewChildInternal(newChild: Expression): IsStopwordExpr =
    copy(child = newChild)
}

object IsStopwordExpr {
  /** Static probe set; UTF8String keys so codegen'd rows never decode. */
  val Set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](512)
    TextFns.EnglishStopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def isStopword(c: Column): Column =
    ColumnBridge.column(IsStopwordExpr(ColumnBridge.expression(c)))
}
