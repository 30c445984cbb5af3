package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte length of a string — the compression-ratio
  * quality signal (Gopher/RefinedWeb-style): natural prose compresses to a
  * fairly stable fraction of its raw size, while boilerplate, templated
  * spam, and repetition collapse far below it and high-entropy noise
  * stays near (or above) 1.0 — so `deflate_len / byte_len` separates
  * document classes no token-level ratio sees at once.
  *
  * A codegen'd `UnaryExpression` (no UDF SerDe, no codegen fence, the
  * reference-trainer discipline of [[StemExpression]]); the kernel runs
  * one `java.util.zip.Deflater` pass per row on the UTF-8 bytes at the
  * default level with a stack buffer. Deterministic for a fixed input
  * (fixed level + strategy), so the signal is reproducible run-to-run —
  * but it is NOT pinned across zlib builds, which is why the q146 report
  * is declared rows-only instead of DuckDB-oracled (DuckDB exposes no
  * deflate surface to mirror it anyway); CompressionSignalSpec pins the
  * separation claims instead.
  */
case class CompressionSignalExpression(child: Expression)
    extends UnaryExpression {

  // analysis-time signature: misuse fails in the analyzer, not in the kernel
  override def checkInputDataTypes(): TypeCheckResult =
    // NullType accepted: a null literal evaluates to null via nullSafeEval
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires a STRING child, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    CompressionSignalExpression.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressionSignalExpression.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionSignalExpression =
    copy(child = newChild)
}

object CompressionSignalExpression {

  /** Deflate the UTF-8 bytes, return the compressed length. The 8 KiB
    * chunk buffer is reused across finished() polls, not across rows —
    * rows run concurrently across codegen'd tasks, so per-call locals are
    * the thread-safety story (a shared Deflater would need sync). */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column entry point: compressed byte length of `c`. */
  def deflateLen(c: Column): Column =
    ColumnBridge.column(CompressionSignalExpression(ColumnBridge.expression(c)))
}
