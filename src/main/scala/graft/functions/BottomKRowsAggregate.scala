package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer
import scala.collection.mutable

/** Bounded bottom-k aggregate over (orderKey, row) pairs: keeps the k rows
  * with the SMALLEST binary order keys per group, carrying the full row
  * struct in the size-k heap so the winners need no join-back against the
  * input. This is the scale-safe form of "exact-n per-class sample ordered
  * by a content hash" (reference X1, /root/reference/src/main.py:67-69):
  * a `row_number() OVER (PARTITION BY class ORDER BY hash)` window
  * hash-partitions into as many tasks as there are classes — a 2-class
  * corpus sorts ~half the data through ONE task — whereas this aggregate's
  * map side keeps at most k candidates per class per input partition, the
  * shuffle moves ≤ k·classes·partitions tiny buffers, and the final merge
  * is the exact top-n over the survivors. No per-class sort ever happens.
  *
  * Ordering: unsigned byte-lexicographic on the key (UTF8String binary
  * order — identical to how Spark's sort and DuckDB order ASCII strings),
  * with the serialized row bytes as an arbitrary-but-deterministic tiebreak
  * so merge order can never change the result. Callers encode their sort
  * key so byte order = semantic order (md5 hex is already such an encoding;
  * sign-flipped zero-padded hex for signed longs — see Sampling).
  *
  * Output: array<rowStruct> sorted ascending by key — the element's
  * 1-based array position IS the within-group sample rank.
  */
case class BottomKRows(keyExpr: Expression, rowExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(UTF8String, UnsafeRow)]] {

  require(k >= 1, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(keyExpr, rowExpr)
  override def nullable: Boolean = false

  private def rowType: StructType = rowExpr.dataType.asInstanceOf[StructType]
  override def dataType: DataType = ArrayType(rowType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bottom_k_rows order key must be STRING (a byte-order-encoded sort key), " +
          s"got ${keyExpr.dataType.catalogString}")
    else if (!rowExpr.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"bottom_k_rows row payload must be a STRUCT, got ${rowExpr.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  /** The heap stores UnsafeRow copies; this projection converts whatever
    * InternalRow the struct child evaluates to (created lazily per
    * deserialized task-side instance — generated projections do not
    * serialize). */
  @transient private lazy val toUnsafe: UnsafeProjection = UnsafeProjection.create(rowType)

  /** true iff a orders strictly before b: key bytes ascending, then row
    * bytes (rows compared only on key ties — same-key rows are either
    * identical or an arbitrary-but-deterministic choice). */
  private def less(a: (UTF8String, UnsafeRow), b: (UTF8String, UnsafeRow)): Boolean = {
    val c = a._1.compareTo(b._1)
    if (c != 0) c < 0
    else {
      val x = a._2.getBytes; val y = b._2.getBytes
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
  }

  /** Max-heap: the root is the LARGEST (worst) kept entry, evicted in
    * O(log k) when a smaller candidate arrives. */
  private def ord: Ordering[(UTF8String, UnsafeRow)] =
    (x: (UTF8String, UnsafeRow), y: (UTF8String, UnsafeRow)) =>
      if (less(x, y)) -1 else if (less(y, x)) 1 else 0

  override def createAggregationBuffer(): mutable.PriorityQueue[(UTF8String, UnsafeRow)] =
    mutable.PriorityQueue.empty[(UTF8String, UnsafeRow)](ord)

  private def add(heap: mutable.PriorityQueue[(UTF8String, UnsafeRow)],
                  e: (UTF8String, UnsafeRow)): Unit = {
    if (heap.size < k) heap.enqueue(e)
    else if (less(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
  }

  override def update(heap: mutable.PriorityQueue[(UTF8String, UnsafeRow)], input: InternalRow)
      : mutable.PriorityQueue[(UTF8String, UnsafeRow)] = {
    val key = keyExpr.eval(input)
    if (key != null) { // null order keys carry no defined position — excluded
      val row = rowExpr.eval(input).asInstanceOf[InternalRow]
      // clone/copy: both eval results point into buffers reused per input row
      add(heap, (key.asInstanceOf[UTF8String].clone(), toUnsafe(row).copy()))
    }
    heap
  }

  override def merge(a: mutable.PriorityQueue[(UTF8String, UnsafeRow)],
                     b: mutable.PriorityQueue[(UTF8String, UnsafeRow)])
      : mutable.PriorityQueue[(UTF8String, UnsafeRow)] = {
    b.foreach(add(a, _)); a
  }

  override def eval(heap: mutable.PriorityQueue[(UTF8String, UnsafeRow)]): Any = {
    val sorted = heap.toArray.sortWith(less)
    new GenericArrayData(sorted.map(_._2.asInstanceOf[Any]))
  }

  override def serialize(heap: mutable.PriorityQueue[(UTF8String, UnsafeRow)]): Array[Byte] = {
    val entries = heap.toArray.map { case (key, row) => (key.getBytes, row.getBytes) }
    val size = 4 + entries.map { case (kb, rb) => 8 + kb.length + rb.length }.sum
    val buf = ByteBuffer.allocate(size)
    buf.putInt(entries.length)
    entries.foreach { case (kb, rb) =>
      buf.putInt(kb.length); buf.put(kb)
      buf.putInt(rb.length); buf.put(rb)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(UTF8String, UnsafeRow)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    val nFields = rowType.size
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](buf.getInt); buf.get(kb)
      val rb = new Array[Byte](buf.getInt); buf.get(rb)
      val row = new UnsafeRow(nFields)
      row.pointTo(rb, rb.length)
      heap.enqueue((UTF8String.fromBytes(kb), row))
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKRows =
    copy(keyExpr = newChildren(0), rowExpr = newChildren(1))
}

object BottomKRows {
  /** `bottomK(orderKey, struct(cols...), k)` → array<struct> of the k rows
    * with the smallest keys, ascending (array position = rank − 1). */
  def bottomK(orderKey: Column, row: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKRows(ColumnBridge.expression(orderKey), ColumnBridge.expression(row), k)
        .toAggregateExpression())
}
