package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash of a text column as ONE native kernel call per row.
  *
  * Value-identical to the composable form in Dedup.simHash history —
  * tokenize with lower+`\W+` (ShingleKernel.lowerTokens), hash each token
  * with the portable md5 seeded hash (seed 0: first 15 hex digits of
  * md5("0:" || token) as a 60-bit long — the exact value DuckDB's oracle
  * computes), then set bit b iff strictly more tokens have bit b set than
  * not (ties → 0). The composable expression evaluated 16 interpreted
  * `size(filter(hashes, …))` lambdas per row (~5.6M lambda evals per sf0.1
  * pass — benched 16 s); this kernel is one tokenize + one md5 per token +
  * a popcount table, and stays inside whole-stage codegen.
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, s"bits out of range: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TokenHashKernel.simHash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashKernel.simHash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object TokenHashKernel {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Thread-local MD5 instance shared by the token kernels (call reset()
    * before use). */
  private[functions] def digest(): java.security.MessageDigest = md5.get()

  /** Portable 60-bit seeded token hash: first 15 hex digits of
    * md5(seed || ":" || s) — bit-identical to Dedup.seededHash /
    * Dedup.seededHashSql (first 15 hex digits ≡ first 8 digest bytes
    * shifted right one nibble). */
  def seededHash(s: String, seed: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(String.valueOf(seed).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.update(':'.toByte)
    d.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def simHash(text: UTF8String, bits: Int): Long = {
    val (toks, nToks) = ShingleKernel.lowerTokens(text)
    val ones = new Array[Int](bits)
    var i = 0
    while (i < nToks) {
      val h = seededHash(toks(i), 0)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) ones(b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (2 * ones(b) > nToks) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object SimHashExpr {
  def simHash(text: Column, bits: Int): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text), bits))
}
