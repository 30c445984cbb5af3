package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection COUNT of two SORTED, DISTINCT `array<string>` or
  * `array<bigint>` columns as one codegen'd merge walk — the per-pair
  * kernel behind q185's overlap rankers. `array_intersect` builds a
  * generic hash set per row (per-element hashing + equality dispatch),
  * which at 500k pairs × ~80 grams each dominated the whole query
  * (measured 19 s at sf0.1); two already-sorted inputs intersect in
  * O(n+m) binary comparisons with zero allocation. Same kernel economics
  * as [[LongDotExpr]]: per-row linear work belongs in generated code, not
  * generic collection machinery. The LONG element form (r19) exists
  * because even the merge walk's cost is the comparator: corpus grams
  * share long prefixes (a 29-word vocabulary), so UTF8 compares walk deep
  * into both strings, while an md5-prefix int64 encoding — computed once
  * per doc, shared with the oracle — compares in one instruction.
  *
  * Contract: both arrays ascending (UTF8 binary order for strings,
  * signed numeric for longs — producers use `array_sort`) with distinct,
  * NON-NULL elements — the producer owns the sort, the way
  * [[graft.functions.BottomKRows]] callers own key encoding. A null
  * ELEMENT returns NULL (sorted order around nulls is not defined here);
  * null arrays are NULL per standard binary-expression semantics.
  * Unsorted input silently undercounts — q185's spec pins the kernel
  * against `array_intersect` on random inputs.
  */
case class SortedInterExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elementType: DataType =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(a, _),
            org.apache.spark.sql.types.ArrayType(b, _)) =>
        a == b && (a == org.apache.spark.sql.types.StringType || a == LongType)
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_inter needs two array<string> or two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val (n, m) = (xs.numElements(), ys.numElements())
    val longs = elementType == LongType
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (xs.isNullAt(i) || ys.isNullAt(j)) return null
      val cmp =
        if (longs) java.lang.Long.compare(xs.getLong(i), ys.getLong(j))
        else xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val compare =
        if (elementType == LongType)
          s"Long.compare($a.getLong($i), $b.getLong($j))"
        else
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m && !${ev.isNull}) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  int $cmp = $compare;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedInterExpr =
    copy(left = newLeft, right = newRight)
}

object SortedInterExpr {
  /** Intersection count of two sorted distinct string arrays. */
  def interCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedInterExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
