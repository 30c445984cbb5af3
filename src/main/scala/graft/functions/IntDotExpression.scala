package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product over two `array<bigint>` columns as one codegen'd
  * kernel — the inner loop of the q166 integer-ANN audit (quantized-vector
  * similarity and literal-plane sign bits), where the composable
  * `aggregate(zip_with(...))` form pays interpreted lambda dispatch per
  * element (~20M dispatches per pass at sf0.1). Integer addition is
  * order-free, so the kernel is trivially bit-equal to both the HOF form
  * and the DuckDB list_reduce mirror. Null/length semantics match the HOF
  * form: unequal lengths or any null element → NULL.
  */
case class LongDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      i += 1
    }
    var dot = 0L
    i = 0
    while (i < n) { dot += xs.getLong(i) * ys.getLong(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}

object LongDotExpr {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
