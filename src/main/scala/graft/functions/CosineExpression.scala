package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared skeleton for binary expressions over two `array<float>` columns.
  *
  * Null/length semantics MATCH the composable HOF forms exactly (so
  * FuseCosineRule is value-preserving): unequal lengths or any null element
  * → NULL (zip_with pads the shorter side with null; a null in any fold
  * nulls the whole aggregate). Subclasses supply only the per-pair compute,
  * in eval and codegen form — keeping the subtle prologue contract in ONE
  * place.
  */
abstract class FloatArrayPairExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null also on length mismatch / null elements (matching the HOF form)
  override def nullable: Boolean = true

  /** Compute the result from two validated, equal-length non-null arrays. */
  protected def compute(xs: ArrayData, ys: ArrayData, n: Int): Double

  /** Java statements computing `resultVar` from validated arrays `a`, `b`
    * of length `n` (loop variable names must be fresh via ctx). */
  protected def computeCode(ctx: CodegenContext, a: String, b: String,
                            n: String, resultVar: String): String

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
    compute(xs, ys, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |${computeCode(ctx, a, b, n, ev.value.toString)}
         |}
       """.stripMargin
    })
}

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
    extends FloatArrayPairExpression {

  override protected def compute(xs: ArrayData, ys: ArrayData, n: Int): Double = {
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < n) { val x = xs.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { val y = ys.getFloat(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def computeCode(ctx: CodegenContext, a: String, b: String,
                                     n: String, resultVar: String): String = {
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    // loop temporaries must also be fresh: a raw `x`/`y` local would shadow
    // (and fail Janino compilation against) any same-named local in the
    // enclosing generated method, silently forcing the interpreted path
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    s"""
       |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
       |  }
       |  for (int $i = 0; $i < $n; $i++) {
       |    double $x = (double) $a.getFloat($i); $na += $x * $x;
       |  }
       |  for (int $i = 0; $i < $n; $i++) {
       |    double $y = (double) $b.getFloat($i); $nb += $y * $y;
       |  }
       |  $resultVar = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarityExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Dot product only — for plans that precompute per-row norms once instead
  * of letting the fused cosine rewalk both arrays per PAIR (brute-force
  * top-k does |Q|·|C| pairs but only |Q|+|C| distinct norms). Same null/
  * length semantics and fold order as the cosine expression (shared base).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends FloatArrayPairExpression {

  override protected def compute(xs: ArrayData, ys: ArrayData, n: Int): Double = {
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def computeCode(ctx: CodegenContext, a: String, b: String,
                                     n: String, resultVar: String): String = {
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    s"""
       |  double $dot = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
       |  }
       |  $resultVar = $dot;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
