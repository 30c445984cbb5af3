package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
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

  /** All k positions of one key, as Catalyst array data — the build side's
    * per-row kernel (see [[BloomPositionsExpr]]). */
  def positionsData(mBits: Int, k: Int, h1: Long, h2: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = position(mBits, i, h1, h2).toLong; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** The k bit positions of a key, computed inside one codegen'd expression
  * with the probe kernel's exact wrapping arithmetic. Used only by the
  * distributed build (explode → or-fold per word); exists because spelling
  * h1 + i·h2 in DataFrame algebra plans ANSI Add/Multiply, which throws
  * ARITHMETIC_OVERFLOW on full-range xxhash64 values. */
case class BloomPositionsExpr(mBits: Int, k: Int, child: Expression)
    extends UnaryExpression {
  require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
  require(k >= 1 && k <= 16, s"k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = BloomProbe.requireString(child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    BloomProbe.positionsData(mBits, k,
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed1),
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BloomProbe.Seed2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.BloomProbe.positionsData($mBits, $k,
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), ${BloomProbe.Seed1}L),
         |  org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $c.getBaseObject(), $c.getBaseOffset(), $c.numBytes(), ${BloomProbe.Seed2}L))""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BloomPositionsExpr =
    copy(child = newChild)
}

object BloomFilterOps {

  /** Bit positions of one key — the probe kernel's own (h1 + i·h2) & (m−1),
    * evaluated inside one codegen'd [[BloomPositionsExpr]] so the BUILD is
    * fully distributed AND bit-identical to the probe (wrapping arithmetic;
    * the earlier DataFrame-algebra form threw ANSI ARITHMETIC_OVERFLOW).
    * Explode to k positions, or-fold per 64-bit word; only the word table
    * (m/64 longs, bounded by construction) is collected. */
  private def positions(c: Column, mBits: Int, k: Int): Column =
    ColumnBridge.column(BloomPositionsExpr(mBits, k, ColumnBridge.expression(c)))

  /** Distributed bloom build over `df(colName)`: returns the bitset.
    *
    * `mBits` must be a power of two; size it ≥ ~10 bits per expected
    * distinct key for ≲1% false positives at k=6. The collected word table
    * is mBits/64 longs (2^24 bits = 256 KB) — the same driver-side bound a
    * broadcast join accepts, and far below it. */
  def buildBloom(df: DataFrame, colName: String, mBits: Int, k: Int = 6): Array[Long] = {
    require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
    require(mBits >= 64, s"mBits too small: $mBits")
    val words = df.select(explode(positions(col(colName), mBits, k)).as("pos"))
      .selectExpr("CAST(shiftright(pos, 6) AS INT) AS w",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS b")
      .groupBy("w").agg(bit_or(col("b")).as("word"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getAs[Int]("w")) = bits(r.getAs[Int]("w")) | r.getAs[Long]("word"))
    bits
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
