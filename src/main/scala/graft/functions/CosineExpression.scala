package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity over two `array<float>` columns as one codegen'd
  * Catalyst expression.
  *
  * The composable form (VectorFns.cosine = 3 `aggregate` HOF folds + 2
  * `transform`s) walks both arrays five times through interpreted lambda
  * dispatch; this walks each once with primitive accumulators inside
  * whole-stage codegen — the KNN/similarity inner loop at 100 TB.
  *
  * Accumulation order is IDENTICAL to the composable form (sequential
  * left-to-right per accumulator, elements cast to double before
  * multiplying), so results stay bit-equal to both VectorFns.cosine and the
  * DuckDB oracle fold.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < xs.numElements()) { val x = xs.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < ys.numElements()) { val y = ys.getFloat(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double x = (double) $a.getFloat($i); $na += x * x;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double y = (double) $b.getFloat($i); $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarityExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
