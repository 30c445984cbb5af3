package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct lowercase word n-gram shingles of a text column as ONE native
  * kernel call per row.
  *
  * Semantics are exactly the composable form
  * `array_distinct(grams(filter(split(lower(text), "\\W+"), _ != "")))` —
  * same Unicode lowercase (UTF8String.toLowerCase), same Java `\W+` regex
  * split, same keep-first distinct — and the DuckDB oracle mirror is
  * unchanged. It exists because that composable form evaluates through
  * interpreted higher-order-function lambdas at ~0.5 ms per document
  * (measured: one sf0.1 shingle pass = 2.5 s of executor CPU), which made
  * every shingle-keyed operator (n-gram dedup, MinHash, contamination,
  * connected components) CPU-bound before any shuffle. One fused loop per
  * row does the same work in tens of microseconds and stays inside
  * whole-stage codegen.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 16, s"n out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShingleKernel {
  private val wordBreak = java.util.regex.Pattern.compile("\\W+")

  /** Lowercased non-empty word tokens, compacted in place: the kernel form
    * of `filter(split(lower(text), "\\W+"), _ != "")`. Returns the backing
    * array and the live token count (the tail beyond it is garbage). */
  def lowerTokens(text: UTF8String): (Array[String], Int) = {
    val raw = wordBreak.split(text.toLowerCase.toString, -1)
    var nToks = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { raw(nToks) = raw(i); nToks += 1 }
      i += 1
    }
    (raw, nToks)
  }

  /** Tokens → ordered n-grams WITH repeats (gram i starts at token i); the
    * positional stream behind [[graft.functions.PositionalGramsExpr]]. */
  def orderedGrams(text: UTF8String, n: Int): GenericArrayData = {
    val (raw, nToks) = lowerTokens(text)
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nToks - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= nToks - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(raw(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Tokens → distinct ordered n-grams, one allocation-light pass.
    * Mirrors Spark built-ins step for step: UTF8String.toLowerCase ≡
    * lower(), Pattern("\\W+").split(s, -1) ≡ split(text, "\\W+"), empty
    * tokens dropped, grams joined with a single space, first-occurrence
    * distinct ≡ array_distinct. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val (raw, nToks) = lowerTokens(text)
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](nToks * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= nToks - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(raw(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

object ShinglesExpr {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n))
}

/** ORDERED word n-grams of a text column — [[ShinglesExpr]] without the
  * distinct, so element index i (0-based) IS the gram's token position.
  * This is the fingerprint stream exact substring-span dedup needs
  * (Lee et al. 2021: duplicated spans are maximal runs of position-aligned
  * equal grams); the distinct shingle set used by Jaccard/MinHash cannot
  * carry positions. Same tokenize loop, same single-space join, same
  * codegen shape as the shingle kernel.
  */
case class PositionalGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 16, s"n out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_positional_grams requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.orderedGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.orderedGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PositionalGramsExpr =
    copy(child = newChild)
}

object PositionalGramsExpr {
  def grams(text: Column, n: Int): Column =
    ColumnBridge.column(PositionalGramsExpr(ColumnBridge.expression(text), n))
}
