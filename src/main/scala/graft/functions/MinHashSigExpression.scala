package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a text column as ONE native kernel call per row.
  *
  * Value-identical to the composable form kept at
  * `Dedup.minHashSignatureComposable` (spec-pinned): distinct word
  * n-gram shingles (the [[ShingleKernel]] semantics), then for each seed
  * `i < numHashes` the minimum over shingles of the portable 60-bit hash
  * — first 15 hex digits of md5(i || ":" || shingle), the exact value
  * DuckDB's oracle computes — with Long.MaxValue for an empty shingle
  * set. The composable form pays `numHashes` interpreted `transform`
  * lambdas per row, hashing through hex-string md5 + substring + conv and
  * re-reading the shingle array each pass; this kernel tokenizes once,
  * hashes each distinct shingle's UTF-8 bytes `numHashes` times off one
  * thread-local digest, and stays inside whole-stage codegen.
  */
case class MinHashSigExpr(child: Expression, n: Int, numHashes: Int)
  extends UnaryExpression {

  require(n >= 1 && n <= 16, s"n out of range: $n")
  require(numHashes >= 1 && numHashes <= 64, s"numHashes out of range: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.signature($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashKernel {
  // "i:" prefixes pre-encoded for every legal seed — one per-row allocation
  // fewer per (shingle, seed); 64 is MinHashSigExpr's numHashes ceiling
  private val seedBytes: Array[Array[Byte]] =
    Array.tabulate(64)(i => (String.valueOf(i) + ":")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def signature(text: UTF8String, n: Int, numHashes: Int): UnsafeArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val (raw, nToks) = ShingleKernel.lowerTokens(text)
    if (nToks >= n) {
      val seen = new java.util.HashSet[String](nToks * 2)
      val sb = new java.lang.StringBuilder(64)
      val md = TokenHashKernel.digest()
      var i = 0
      while (i <= nToks - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(raw(i + j))
          j += 1
        }
        val s = sb.toString
        // first-occurrence distinct, matching array_distinct: a repeated
        // shingle can't change any minimum, so skipping it is also the
        // cheap path
        if (seen.add(s)) {
          val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var k = 0
          while (k < numHashes) {
            md.reset()
            md.update(seedBytes(k))
            md.update(bytes)
            val d = md.digest()
            // first 15 hex digits == first 8 digest bytes >>> one nibble
            var v = 0L
            var b = 0
            while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
            v >>>= 4
            if (v < out(k)) out(k) = v
            k += 1
          }
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object MinHashSigExpr {
  def signature(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), n, numHashes))
}
