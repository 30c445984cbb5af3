package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast Bloom-filter membership as a codegen'd Catalyst expression —
  * the scan-side prefilter for "does this key appear in the other table"
  * joins (train/eval contamination, blocklist lookups, dirty-key checks).
  *
  * At 100 TB the exact shingle join (q38) shuffles every corpus shingle;
  * with a bloom prefilter only PROBABLE hits reach the shuffle, and because
  * a bloom filter has no false negatives the exact join over the survivors
  * returns exactly the unfiltered answer — the same pattern Spark itself
  * uses for runtime row-group filtering, here as a first-class operator.
  *
  * Probes use double hashing (pos_i = h1 + i·h2 mod m, Kirsch-Mitzenmacher)
  * over the two xxhash64 seeds, against an immutable Array[Long] bitset that
  * ships to executors once via the closure/reference mechanism. The probe
  * loop lives in [[BloomProbe]] so interpreted eval and generated code run
  * literally the same bytes.
  */
case class BloomMightContainExpr(bits: Array[Long], mBits: Int, k: Int,
                                 child: Expression) extends UnaryExpression {

  require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
  require(bits.length == mBits / 64, s"bitset length ${bits.length} != $mBits/64")
  require(k >= 1 && k <= 16, s"k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = BloomProbe.requireString(child)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    BloomProbe.mightContain(bits, mBits, k,
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed1),
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.BloomProbe.mightContain($bitsRef, $mBits, $k,
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), ${BloomProbe.Seed1}L),
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), ${BloomProbe.Seed2}L))""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

/** Shared probe kernel (called from both interpreted eval and codegen). */
object BloomProbe {
  val Seed1 = 41L
  val Seed2 = 97L

  /** Analysis-time input check shared by both bloom expressions: the probe
    * kernels hash raw UTF8 bytes, so a non-string child must fail in the
    * analyzer with a readable message, not as a ClassCastException inside
    * nullSafeEval on the first executor row. */
  private[functions] def requireString(child: Expression): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom expressions require a STRING child, got ${child.dataType.catalogString}")

  /** Bit position of probe `i` for a key with hashes (h1, h2): Kirsch-
    * Mitzenmacher double hashing with Java WRAPPING arithmetic — the ONE
    * definition both the probe loop and the distributed build call, so the
    * two can never disagree (Catalyst Add/Multiply would throw on the
    * ~50%-of-keys overflow under ANSI mode; wrapping is the semantics). */
  def position(mBits: Int, i: Int, h1: Long, h2: Long): Int =
    ((h1 + i * h2) & (mBits - 1L)).toInt // mBits is a power of two: & (m-1) is an exact non-negative mod

  def mightContain(bits: Array[Long], mBits: Int, k: Int, h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = position(mBits, i, h1, h2)
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Same probe against an ArrayData-backed bitset (the LAZY build path,
    * where the bits arrive as a broadcast-joined array<long> COLUMN instead
    * of a plan-time literal). Identical probe sequence to [[mightContain]].
    * Fails fast on a build/probe mBits mismatch: a LARGER bitset than the
    * probe's mBits would otherwise probe garbage silently (only a smaller
    * one trips out-of-bounds), so the length is validated every call — one
    * integer compare against k hash probes is noise. */
  def mightContainData(bits: ArrayData, mBits: Int, k: Int, h1: Long, h2: Long): Boolean = {
    // ceil-divide so the check stays correct even for an mBits that is not
    // a multiple of 64 — the expression layer requires power-of-two mBits,
    // but this helper is public and shouldn't depend on that caller contract
    val expectWords = (mBits + 63) >> 6
    if (bits.numElements() != expectWords)
      throw new IllegalArgumentException(
        s"bloom bitset length ${bits.numElements()} != ceil(mBits/64) = $expectWords: " +
          "build and probe were configured with different mBits")
    var i = 0
    while (i < k) {
      val pos = position(mBits, i, h1, h2)
      if ((bits.getLong(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Set one key's k bits in a mutable bitset — the BUILD-side kernel,
    * literally the probe loop with reads swapped for writes, so build and
    * probe can never disagree on positions. */
  def insert(bits: Array[Long], mBits: Int, k: Int, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = position(mBits, i, h1, h2)
      bits(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }
}

/** The bloom BUILD as a lazy Catalyst aggregate: each task keeps one dense
  * mBits/64-long bitset buffer, inserts with the probe kernel's own
  * position arithmetic, partials or-merge, and eval() emits the bitset as
  * one array<long> value — so the filter is built inside the query DAG
  * (typically a global aggregate → 1-row result → `broadcast` cross join to
  * the probe side) and CONSTRUCTING a bloom-prefiltered query runs zero
  * Spark jobs.
  *
  * Shape at scale: buffer size is fixed by mBits (≤ 8 MB at the pickMBits
  * cap), ONE buffer per task regardless of row count, and the shuffle to
  * the final merge carries one serialized buffer per partition — bounded by
  * partition count, never data volume. Insert order is irrelevant (bit OR
  * commutes), so the result is deterministic under any partitioning.
  */
case class BloomBuildAggregate(child: Expression, mBits: Int, k: Int = 6,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
  require(mBits >= 64, s"mBits too small: $mBits")
  require(k >= 1 && k <= 16, s"k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = BloomProbe.requireString(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      BloomProbe.insert(bits, mBits, k,
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed1),
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed2))
    }
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(bits: Array[Long]): Any = new GenericArrayData(bits)

  override def serialize(bits: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(bits.length * 8)
    buf.asLongBuffer().put(bits)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBuildAggregate =
    copy(child = newChildren(0))
}

/** Probe against a COLUMN-borne bitset (the lazy build's output, usually a
  * broadcast-joined 1-row array<long>): true iff the key might be in the
  * set. Same kernel as the literal-bitset [[BloomMightContainExpr]]. */
case class BloomMightContainColExpr(mBits: Int, k: Int,
                                    left: Expression, right: Expression)
    extends BinaryExpression {

  require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
  require(k >= 1 && k <= 16, s"k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) => BloomProbe.requireString(right)
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom bitset operand must be ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bitsAny: Any, keyAny: Any): Any = {
    val s = keyAny.asInstanceOf[UTF8String]
    BloomProbe.mightContainData(bitsAny.asInstanceOf[ArrayData], mBits, k,
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed1),
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, c) =>
      s"""graft.functions.BloomProbe.mightContainData($b, $mBits, $k,
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), ${BloomProbe.Seed1}L),
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), ${BloomProbe.Seed2}L))""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContainColExpr =
    copy(left = newLeft, right = newRight)
}

object BloomFilterOps {

  /** LAZY distributed build: aggregate `c`'s values into one array<long>
    * bitset column ([[BloomBuildAggregate]]). Typical use:
    * `df.agg(bloomAgg(col("key"), m).as("__bloom"))` → 1-row DataFrame →
    * `crossJoin(broadcast(...))` into the probe side + [[mightContainIn]].
    * Nothing executes until the consuming query runs. */
  def bloomAgg(c: Column, mBits: Int, k: Int = 6): Column =
    ColumnBridge.column(
      BloomBuildAggregate(ColumnBridge.expression(c), mBits, k).toAggregateExpression())

  /** Probe column against a column-borne bitset (see [[bloomAgg]]).
    * Contract: `bitsCol` must be a bitset built by [[bloomAgg]] with the
    * SAME mBits and k — the array length (mBits/64) cannot be validated at
    * analysis time, so the probe kernel checks it per call and throws on
    * the first mismatched row instead of silently probing garbage. */
  def mightContainIn(bitsCol: Column, mBits: Int, k: Int, c: Column): Column =
    ColumnBridge.column(BloomMightContainColExpr(mBits, k,
      ColumnBridge.expression(bitsCol), ColumnBridge.expression(c)))

  /** EAGER build over `df(colName)`: runs the lazy aggregate now and returns
    * the bitset for literal embedding ([[mightContain]]) — the audit/spec
    * path. The collected bitset is mBits/64 longs (≤ 8 MB at the pickMBits
    * cap) — the same driver-side bound a broadcast join accepts. */
  def buildBloom(df: DataFrame, colName: String, mBits: Int, k: Int = 6): Array[Long] = {
    val row = df.agg(bloomAgg(col(colName), mBits, k).as("bits")).head()
    row.getSeq[Long](0).toArray
  }

  /** Probe column: true iff `c` MIGHT be in the set (no false negatives). */
  def mightContain(bits: Array[Long], mBits: Int, k: Int, c: Column): Column =
    ColumnBridge.column(BloomMightContainExpr(bits, mBits, k, ColumnBridge.expression(c)))

  /** Power-of-two bit count for ~`bitsPerKey` bits per expected distinct
    * key (12 bits/key + k=6 → ≲1% false positives), floored at 2^14 and
    * capped at `maxBits` (2^26 = 8 MB — still broadcast-sized; beyond that,
    * shard the filter or fall back to the plain join). */
  def pickMBits(expectedKeys: Long, bitsPerKey: Int = 12, maxBits: Int = 1 << 26): Int = {
    require(Integer.bitCount(maxBits) == 1, s"maxBits must be a power of two: $maxBits")
    val want = math.min(math.max(1L << 14, expectedKeys * bitsPerKey), maxBits.toLong)
    val pow2 = 1L << (64 - java.lang.Long.numberOfLeadingZeros(math.max(want - 1, 1)))
    math.min(pow2, maxBits.toLong).toInt
  }
}
