package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's clean chain T1→T4 (URL strip → punctuation strip →
  * tokenize → case-sensitive stopword filter) as one kernel call per row.
  *
  * Step-for-step the same Java regex engine and pattern strings as the
  * composable `regexp_replace`/`split`/`filter` form it replaces — and the
  * same DuckDB mirror (CleanToksSql) — so results are bit-identical; only
  * the per-element interpreted-lambda overhead of the tokenize and
  * stopword HOF steps is gone (the chain runs under ten of the declared
  * queries, ~0.3 ms/doc before). */
case class CleanTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_clean_tokens requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CleanChainKernel.cleanTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CleanChainKernel.cleanTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanTokensExpr =
    copy(child = newChild)
}

/** `transform(tokens, t => StemExpression.stem(t))` as one kernel loop —
  * same PorterStemmer.stem per element without interpreted per-element
  * expression evaluation. */
case class StemTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_stem_tokens requires ARRAY<STRING>, got ${other.catalogString}")
    }

  // transform-lambda semantics: a null token stems to null, so null
  // presence in the output tracks the input array exactly.
  override def dataType: DataType = ArrayType(StringType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override protected def nullSafeEval(input: Any): Any =
    CleanChainKernel.stemAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CleanChainKernel.stemAll($c)")

  override protected def withNewChildInternal(newChild: Expression): StemTokensExpr =
    copy(child = newChild)
}

object CleanChainKernel {
  // The exact pattern strings of TextFns.stripUrls / stripPunct /
  // tokenize, compiled once. Same java.util.regex engine that
  // regexp_replace and split use, so replacement and splitting semantics
  // cannot diverge.
  private val urlP = java.util.regex.Pattern.compile("(?i)\\bhttps?://\\S+|\\bwww\\.\\S+")
  private val punctP = java.util.regex.Pattern.compile("[\\p{Punct}]")
  private val wordBreak = java.util.regex.Pattern.compile("\\W+")

  def cleanTokens(text: UTF8String): GenericArrayData = {
    val noUrls = urlP.matcher(text.toString).replaceAll("")
    val noPunct = punctP.matcher(noUrls).replaceAll("")
    val raw = wordBreak.split(noPunct, -1)
    val out = new java.util.ArrayList[Any](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        val t = UTF8String.fromString(raw(i))
        if (!IsStopwordExpr.Set.contains(t)) out.add(t)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Null tokens stem to null (the transform-lambda behavior this kernel
    * replaces). */
  def stemAll(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        out(i) = UTF8String.fromString(PorterStemmer.stem(tokens.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object CleanTokensExpr {
  def cleanTokens(text: Column): Column =
    ColumnBridge.column(CleanTokensExpr(ColumnBridge.expression(text)))
}

object StemTokensExpr {
  def stemTokens(tokens: Column): Column =
    ColumnBridge.column(StemTokensExpr(ColumnBridge.expression(tokens)))
}
