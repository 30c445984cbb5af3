package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All of a CMS sketch's (w, j, bucket) cell counts in ONE fused aggregate —
  * the r21 replacement for `explode(array(d·|widths| structs)) → groupBy`
  * (q198's sketch build): the explode materialized d·|widths| struct rows
  * per INPUT row and pushed them through a hash aggregate (one key probe +
  * UnsafeRow per struct), where this buffer does d·|widths| array increments
  * per row into fixed Σ d·w cell state. Identical cell counts by
  * construction: bucket = (h1 + j·h2) mod w is a pure function of the input
  * hashes, and per-bucket addition is order-free.
  *
  * Kirsch-Mitzenmacher double hashing, matching the expression form
  * `pmod(h1 + j·h2, w)` exactly: callers pass h1 ≥ 0 and h2 ≥ 1 (both built
  * from 15 hex chars of md5, so ≤ 2^60; j ≤ d−1 keeps the sum far below
  * 2^63 — no overflow, and mod of a non-negative is already positive).
  *
  * A NULL h1/h2 maps every (w, j) to the NULL bucket with the row counted —
  * exactly what `pmod(NULL…)` + groupBy produced in the explode form.
  *
  * Shape at scale: ONE Σ d·w-long buffer per task regardless of row count,
  * partials merged by elementwise add — the same fixed-state semilattice
  * contract as [[BloomBuildAggregate]]. eval() emits only non-empty cells
  * (the groupBy form never produced empty ones).
  */
case class CmsCellsAggregate(h1: Expression, h2: Expression,
                             widths: Seq[Int], d: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(widths.nonEmpty && widths.forall(_ > 0), s"bad widths: $widths")
  require(d >= 1 && d <= 16, s"d out of range: $d")

  private val cellsLen: Int = widths.map(_ * d).sum
  // base offset of each width's d×w block, aligned with `widths`
  private val bases: Array[Int] = widths.scanLeft(0)((acc, w) => acc + w * d).toArray

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = true),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (h1.dataType == LongType && h2.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_cells requires BIGINT hashes, got (${h1.dataType.catalogString}, ${h2.dataType.catalogString})")

  /** cells(0) counts NULL-hash rows; cells(1..cellsLen) are the buckets. */
  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + cellsLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = h1.eval(input)
    val v2 = h2.eval(input)
    if (v1 == null || v2 == null) { buf(0) += 1; return buf }
    val a = v1.asInstanceOf[Long]
    val b = v2.asInstanceOf[Long]
    var wi = 0
    while (wi < widths.length) {
      val w = widths(wi)
      val base = 1 + bases(wi)
      var j = 0
      while (j < d) {
        // callers guarantee a, b ≥ 0 so the plain mod IS pmod; the
        // normalization below keeps the kernel total for any input
        val m = (a + j * b) % w
        buf(base + j * w + (if (m < 0) (m + w).toInt else m.toInt)) += 1
        j += 1
      }
      wi += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var wi = 0
    while (wi < widths.length) {
      val w = widths(wi)
      val base = 1 + bases(wi)
      var j = 0
      while (j < d) {
        var bucket = 0
        while (bucket < w) {
          val c = buf(base + j * w + bucket)
          if (c != 0L)
            out += new GenericInternalRow(Array[Any](w.toLong, j, bucket.toLong, c))
          bucket += 1
        }
        // the NULL bucket: every null-hash row lands in (w, j, NULL)
        if (buf(0) != 0L)
          out += new GenericInternalRow(Array[Any](w.toLong, j, null, buf(0)))
        j += 1
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCellsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCellsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsCellsAggregate =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

object CmsCells {
  /** Aggregate (h1, h2) rows into the full (w, j, bucket, c) cell list —
    * explode the result to get exactly what the explode+groupBy form built. */
  def cmsCells(h1: Column, h2: Column, widths: Seq[Int], d: Int): Column =
    ColumnBridge.column(
      CmsCellsAggregate(ColumnBridge.expression(h1), ColumnBridge.expression(h2),
        widths, d).toAggregateExpression())
}
