package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the memory-compression
  * half of a 100 TB ANN index: each D-dim vector splits into `m`
  * subvectors of `subDim` dims, each subvector snaps to its nearest of
  * `ksub` per-subspace centroids, and the vector is stored as m small
  * codes (m bytes at ksub ≤ 256) instead of D floats. Query scoring is
  * asymmetric-distance (ADC): the query precomputes one m×ksub lookup
  * table of exact subvector dots against the codebook, and every corpus
  * vector scores with m table lookups instead of D multiplies.
  *
  * All three hot paths are native codegen'd expressions; the codebook
  * rides into the generated code as ONE plan reference object (the
  * SignBandKeysExpr lesson: inlined literals re-plan per appearance).
  * Layout: `cb[(j·ksub + c)·subDim + d]` = dim d of centroid c of
  * subspace j.
  *
  * Degenerate-input contract (parallel to SignBandKeys' all-zero keys): a
  * NULL / wrong-length / null-element embedding encodes to all-zero codes
  * with reconstruction norm 0, and its LUT is all-zero — the serving
  * path's zero-norm guard then NULLs its similarity so it never ranks,
  * without nullability plumbing through the aggregate.
  */
object PqKernel {

  private def degenerate(emb: ArrayData, dims: Int): Boolean = {
    if (emb == null || emb.numElements() != dims) return true
    var i = 0
    var anyNonZero = false
    while (i < dims) {
      if (emb.isNullAt(i)) return true
      if (emb.getFloat(i) != 0.0f) anyNonZero = true
      i += 1
    }
    // a zero vector has no cosine (the exact path NULLs it via the norm
    // guard) but WOULD quantize to its nearest nonzero centroid and rank —
    // treat it as degenerate so PQ preserves the never-ranks contract
    !anyNonZero
  }

  /** codes[j] = argmin_c ‖x_j − cb_jc‖² (first index wins ties — Lloyd
    * assignment, deterministic) plus the reconstruction norm
    * √Σ_j ‖cb_j,codes[j]‖² — the ‖x̂‖ the ADC cosine divides by. */
  def encode(emb: ArrayData, cb: Array[Float], m: Int, ksub: Int, subDim: Int): InternalRow = {
    val codes = new Array[Int](m)
    var rn2 = 0.0
    if (!degenerate(emb, m * subDim)) {
      var j = 0
      while (j < m) {
        var best = 0
        var bestDist = Double.MaxValue
        var c = 0
        while (c < ksub) {
          val base = (j * ksub + c) * subDim
          var dist = 0.0
          var d = 0
          while (d < subDim) {
            val diff = emb.getFloat(j * subDim + d).toDouble - cb(base + d).toDouble
            dist += diff * diff
            d += 1
          }
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        codes(j) = best
        val base = (j * ksub + best) * subDim
        var d = 0
        while (d < subDim) {
          val v = cb(base + d).toDouble
          rn2 += v * v
          d += 1
        }
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), math.sqrt(rn2)))
  }

  /** lut[j·ksub + c] = dot(q_j, cb_jc): the per-query ADC table — exact
    * double-accumulated dots, computed once per QUERY row (queries ≪
    * corpus), so per-PAIR work collapses to m lookups. */
  def lut(emb: ArrayData, cb: Array[Float], m: Int, ksub: Int, subDim: Int): ArrayData = {
    val out = new Array[Double](m * ksub)
    if (!degenerate(emb, m * subDim)) {
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          val base = (j * ksub + c) * subDim
          var dot = 0.0
          var d = 0
          while (d < subDim) {
            dot += emb.getFloat(j * subDim + d).toDouble * cb(base + d).toDouble
            d += 1
          }
          out(j * ksub + c) = dot
          c += 1
        }
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Σ_j lut[j·ksub + codes[j]] ≈ dot(q, x̂) — the ADC inner product; m
    * array reads per pair, fixed left-to-right accumulation order. */
  def adcDot(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    acc
  }
}

private[functions] trait PqCodebookExpr { self: UnaryExpression =>
  def cb: Array[Float]
  def m: Int
  def ksub: Int
  def subDim: Int

  require(m >= 1 && ksub >= 1 && subDim >= 1, s"bad PQ shape: $m x $ksub x $subDim")
  require(cb.length == m * ksub * subDim,
    s"codebook length ${cb.length} != $m*$ksub*$subDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
}

/** struct(codes array<int>, rnorm double) — see [[PqKernel.encode]]. */
case class PqEncodeExpr(child: Expression, cb: Array[Float], m: Int, ksub: Int,
                        subDim: Int) extends UnaryExpression with PqCodebookExpr {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqKernel.encode(if (v == null) null else v.asInstanceOf[ArrayData], cb, m, ksub, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
         |  graft.functions.PqKernel.encode(
         |    ${childGen.isNull} ? null : ${childGen.value}, $cbRef, $m, $ksub, $subDim);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** array<double> of length m·ksub — see [[PqKernel.lut]]. */
case class PqLutExpr(child: Expression, cb: Array[Float], m: Int, ksub: Int,
                     subDim: Int) extends UnaryExpression with PqCodebookExpr {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqKernel.lut(if (v == null) null else v.asInstanceOf[ArrayData], cb, m, ksub, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.PqKernel.lut(
         |    ${childGen.isNull} ? null : ${childGen.value}, $cbRef, $m, $ksub, $subDim);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC inner product of a code row against a query LUT — the per-pair hot
  * path; see [[PqKernel.adcDot]]. */
case class AdcDotExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_adc_dot requires (ARRAY<INT>, ARRAY<DOUBLE>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqKernel.adcDot(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqKernel.adcDot($c, $l, $ksub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcDotExpr =
    copy(left = newLeft, right = newRight)
}

object PqExprs {
  def encode(emb: Column, cb: Array[Float], m: Int, ksub: Int, subDim: Int): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(emb), cb, m, ksub, subDim))

  def lut(emb: Column, cb: Array[Float], m: Int, ksub: Int, subDim: Int): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(emb), cb, m, ksub, subDim))

  def adcDot(codes: Column, lutCol: Column, ksub: Int): Column =
    ColumnBridge.column(AdcDotExpr(
      ColumnBridge.expression(codes), ColumnBridge.expression(lutCol), ksub))
}
