package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for per-token hot loops that the composable
  * higher-order-function forms evaluate through interpreted lambdas (no
  * codegen, no subexpression elimination inside lambda bodies — measured
  * milliseconds per document instead of microseconds; see ShinglesExpr).
  * Each kernel is value-identical to the expression form it replaces and
  * the DuckDB oracle mirrors are unchanged.
  */
private[functions] object TokenKernelChecks {
  def requireStringArray(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<STRING>, got ${other.catalogString}")
    }
}

/** `transform(ts, t -> conv(substring(md5(t),1,15),16,10) % vocab)` as one
  * kernel call: the bounded token→id encoding (TextFns.tokenId) for every
  * token of a document in a single md5-per-token loop. */
case class TokenIdsExpr(child: Expression, vocabSize: Int) extends UnaryExpression {

  require(vocabSize >= 1, s"vocabSize out of range: $vocabSize")

  override def checkInputDataTypes(): TypeCheckResult =
    TokenKernelChecks.requireStringArray("graft_token_ids", child)

  // transform-lambda semantics: a null element maps to a null id, so null
  // presence in the output tracks the input array exactly.
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override protected def nullSafeEval(input: Any): Any =
    TokenKernel.tokenIds(input.asInstanceOf[ArrayData], vocabSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernel.tokenIds($c, $vocabSize)")

  override protected def withNewChildInternal(newChild: Expression): TokenIdsExpr =
    copy(child = newChild)
}

/** `array_max(transform(array_distinct(ts), u -> size(filter(ts, _ = u))))`
  * — the most-frequent-token count (0 for empty input) — as one hash-count
  * pass instead of an interpreted O(distinct·n) double loop. */
case class TopTokenCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TokenKernelChecks.requireStringArray("graft_top_token_count", child)

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    TokenKernel.topTokenCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernel.topTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenCountExpr =
    copy(child = newChild)
}

object TokenKernel {

  /** First 15 hex digits of md5(token) as a 60-bit long, mod vocab —
    * bit-identical to TextFns.tokenId / its DuckDB rendering. Null elements
    * map to null ids (the transform-lambda behavior this kernel replaces). */
  def tokenIds(tokens: ArrayData, vocabSize: Int): GenericArrayData = {
    val n = tokens.numElements()
    val out = new Array[Any](n)
    val d = TokenHashKernel.digest()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        d.reset()
        d.update(tokens.getUTF8String(i).getBytes)
        val h = d.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
        out(i) = (v >>> 4) % vocabSize
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Null elements are skipped, not counted: the composable
    * `size(filter(ts, _ = u))` form excluded them because `null = u` is
    * never true — an all-null array therefore counts 0. */
  def topTokenCount(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}

object TokenIdsExpr {
  def encode(tokens: Column, vocabSize: Int): Column =
    ColumnBridge.column(TokenIdsExpr(ColumnBridge.expression(tokens), vocabSize))
}

object TopTokenCountExpr {
  def topTokenCount(tokens: Column): Column =
    ColumnBridge.column(TopTokenCountExpr(ColumnBridge.expression(tokens)))
}
