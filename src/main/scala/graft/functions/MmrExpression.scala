package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance selection over a per-query candidate
  * shortlist — the diversity re-rank a retrieval pipeline runs between
  * ANN top-k and serving: greedily pick the candidate maximizing
  * `λ·relevance − (1−λ)·max cosine to anything already picked`, so
  * near-duplicate hits stop crowding out coverage (Carbonell & Goldstein
  * 1998).
  *
  * Runs INSIDE the row as a codegen'd expression over the collected
  * shortlist array (one static kernel call, no UDF fence): the shortlist
  * is bounded (k′ ≪ corpus) by the top-k operator that feeds it, so the
  * O(k·k′) greedy scan with its pairwise cosines is per-row arithmetic —
  * the corpus-scale work stays in the top-k aggregate, and MMR adds ZERO
  * shuffles. Selection is deterministic: argmax with ties broken by
  * smallest id, max() over floats is input-order independent, so the
  * result does not depend on collect_list ordering.
  *
  * Input: array<struct<id: long, score: double, vec: array<float>>>;
  * output: array<struct<id: long, score: double, mmr: double>> in pick
  * order. Zero/ragged vectors get cosine 0 against everything (they
  * never look redundant, matching VectorFns' null-similarity stance).
  */
case class MmrExpression(child: Expression, k: Int, lambdaPct: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = child.nullable

  /** Analysis-time shape check (field NAMES are free; positions and types
    * are not): misuse fails in the analyzer, not as a ClassCastException
    * inside the codegen'd kernel. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // a null literal evaluates to null via the nullSafeEval contract
      case NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(StructType(Array(f0, f1, f2)), _)
        if f0.dataType == LongType && f1.dataType == DoubleType &&
          (f2.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr expects array<struct<id: bigint, score: double, vec: array<float>>>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MmrExpression.select(input.asInstanceOf[ArrayData], k, lambdaPct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MmrExpression.select($c, $k, $lambdaPct)")

  override protected def withNewChildInternal(newChild: Expression): MmrExpression =
    copy(child = newChild)
}

object MmrExpression {

  /** Greedy MMR over catalyst rows; static so codegen calls it directly. */
  def select(candidates: ArrayData, k: Int, lambdaPct: Int): ArrayData = {
    val n = candidates.numElements()
    val ids = new Array[Long](n)
    val scores = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = candidates.getStruct(i, 3)
      ids(i) = row.getLong(0)
      scores(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toFloatArray()
      i += 1
    }
    val lam = lambdaPct / 100.0
    val picked = new Array[Boolean](n)
    // running max-similarity-to-picked per candidate: updating it after
    // each pick keeps the greedy loop O(k·n) instead of O(k²·n).
    // Initialized to -∞, NOT 0: cosine to everything picked can be
    // negative, and flooring the penalty at zero would stop rewarding
    // anti-correlated (maximally diverse) candidates
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[Any](math.min(k, n))
    var round = 0
    while (round < out.length) {
      var best = -1
      var bestVal = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val v = if (round == 0) scores(i) else lam * scores(i) - (1 - lam) * maxSim(i)
          if (v > bestVal || (v == bestVal && (best < 0 || ids(i) < ids(best)))) {
            bestVal = v; best = i
          }
        }
        i += 1
      }
      // every remaining objective NaN (a NaN score upstream poisons the
      // comparison chain): degrade to the shorter pick list instead of
      // indexing with -1 inside the codegen'd kernel
      if (best < 0) {
        val truncated = new Array[Any](round)
        System.arraycopy(out, 0, truncated, 0, round)
        return new GenericArrayData(truncated)
      }
      picked(best) = true
      out(round) = InternalRow(ids(best), scores(best), bestVal)
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val s = cosine(vecs(i), vecs(best))
          if (s > maxSim(i)) maxSim(i) = s
        }
        i += 1
      }
      round += 1
    }
    new GenericArrayData(out)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    // full norms, not just the overlapping prefix
    i = n
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = n
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Column entry point: `mmr(candidates, k = 5, lambdaPct = 70)`. */
  def mmr(candidates: Column, k: Int, lambdaPct: Int): Column = {
    require(k >= 1 && lambdaPct >= 0 && lambdaPct <= 100)
    ColumnBridge.column(MmrExpression(ColumnBridge.expression(candidates), k, lambdaPct))
  }
}

/** [[MmrExpression]]'s exact-INTEGER twin (the q169 oracle-checked
  * variant): relevance and the redundancy penalty are integer dot products
  * over quantized vectors, the objective is
  * `λpct·rel − (100−λpct)·maxDotToPicked` in exact long arithmetic, and
  * pick 1 goes by raw relevance like the float kernel's round 0 — so the
  * whole greedy is bit-identical to an unrolled SQL mirror, which is what
  * lets a DIVERSITY RE-RANK hash-verify cross-engine. Same in-row shape
  * (one kernel call over the collected shortlist, zero extra shuffles),
  * same id tie-break, same order-independence from collect_list.
  *
  * Input: array<struct<id: long, rel: long, qv: array<long>>>;
  * output: array<struct<id: long, rel: long, obj: long>> in pick order.
  */
case class IntMmrExpression(child: Expression, k: Int, lambdaPct: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rel", LongType, nullable = false),
    StructField("obj", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(StructType(Array(f0, f1, f2)), _)
        if f0.dataType == LongType && f1.dataType == LongType &&
          (f2.dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int mmr expects array<struct<id: bigint, rel: bigint, qv: array<bigint>>>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    IntMmrExpression.select(input.asInstanceOf[ArrayData], k, lambdaPct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IntMmrExpression.select($c, $k, $lambdaPct)")

  override protected def withNewChildInternal(newChild: Expression): IntMmrExpression =
    copy(child = newChild)
}

object IntMmrExpression {

  def select(candidates: ArrayData, k: Int, lambdaPct: Int): ArrayData = {
    val n = candidates.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Long](n)
    val vecs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = candidates.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getLong(1)
      vecs(i) = row.getArray(2).toLongArray()
      i += 1
    }
    val picked = new Array[Boolean](n)
    val maxSim = Array.fill(n)(Long.MinValue)
    val out = new Array[Any](math.min(k, n))
    var round = 0
    while (round < out.length) {
      var best = -1
      var bestVal = Long.MinValue
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val v =
            if (round == 0) rels(i)
            else lambdaPct * rels(i) - (100 - lambdaPct) * maxSim(i)
          if (best < 0 || v > bestVal || (v == bestVal && ids(i) < ids(best))) {
            bestVal = v; best = i
          }
        }
        i += 1
      }
      picked(best) = true
      out(round) = InternalRow(ids(best), rels(best), bestVal)
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val s = dot(vecs(i), vecs(best))
          if (s > maxSim(i)) maxSim(i) = s
        }
        i += 1
      }
      round += 1
    }
    new GenericArrayData(out)
  }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Column entry point: `intMmr(candidates, k = 5, lambdaPct = 70)`. */
  def intMmr(candidates: Column, k: Int, lambdaPct: Int): Column = {
    require(k >= 1 && lambdaPct >= 0 && lambdaPct <= 100)
    ColumnBridge.column(IntMmrExpression(ColumnBridge.expression(candidates), k, lambdaPct))
  }
}
