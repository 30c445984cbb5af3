package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key of two LONG columns: their low 32 bits bit-interleaved
  * into one 64-bit sort key, so sorting by the key tiles the (a, b) plane in
  * locality-preserving squares — the layout trick behind multi-column
  * row-group pruning (Delta/Iceberg `ZORDER BY`), here for plain parquet:
  * write sorted by the key and BOTH columns get tight per-file min/max
  * statistics, where a plain sort gives them to its leading column only.
  *
  * Contract: inputs must be NON-NEGATIVE and fit in 32 bits (ids, bucketed
  * values, dictionary codes) — the kernel interleaves the LOW 32 bits, so
  * wider or negative values alias (rank- or range-normalize first; the
  * pruning benefit only needs order, not exact values). NULL in either
  * column → NULL key (standard binary-expression semantics); sort such rows
  * explicitly if the sink must place them.
  */
case class ZOrderKeyExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder_key requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKernel.morton($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrderKeyExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderKernel {

  /** Spread the low 32 bits of `x` over the even bit positions of a long
    * (classic magic-mask dilation, 5 shift/mask rounds). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton interleave: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def zorderKey(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderKeyExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
