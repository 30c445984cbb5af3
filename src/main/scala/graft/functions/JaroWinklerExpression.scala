package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a codegen'd Catalyst expression —
  * the record-linkage scorer Spark lacks natively (it ships only
  * levenshtein/soundex), completing the fuzzy-matching band beside the
  * threshold-bounded Levenshtein (q93) and the CC entity resolution
  * (q140). Semantics pinned to the de-facto standard (and empirically to
  * DuckDB's implementation, which is what lets q153 hash-verify a FLOAT
  * similarity): match window `max(|a|,|b|)/2 − 1`, transpositions =
  * mismatched match positions / 2 (INTEGER halving), Winkler boost
  * p = 0.1 over a ≤ 4-char common prefix applied only when jaro > 0.7,
  * and 0.0 when either side is empty.
  */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  // analysis-time signature: wrong-typed children fail in the analyzer, not
  // as a ClassCastException inside the codegen'd kernel
  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType accepted: a null literal child evaluates to null via the
    // nullSafeEval contract, exactly as before the analysis-time check
    def ok(t: org.apache.spark.sql.types.DataType) =
      t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler requires two STRING children, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerExpression.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpression.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpression {

  /** Static kernel; codegen calls it directly. */
  def similarity(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString
    val b = s2.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order, count
    // mismatched positions, integer-halve (the jellyfish/RapidFuzz and
    // DuckDB convention — pinned by the 'abcdef'/'bcadef' = 17/18 case)
    var mismatches = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) mismatches += 1
        j += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column entry point: `jaroWinkler($"a", $"b")`. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
