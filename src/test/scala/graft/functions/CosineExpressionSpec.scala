package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class CosineExpressionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType, containsNull = true)),
    StructField("b", ArrayType(FloatType, containsNull = true))))

  private def run(rows: Seq[Row]) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    df.select(
      CosineSimilarityExpr.cosine(col("a"), col("b")).as("cos"),
      DotProductExpr.dot(col("a"), col("b")).as("dot"),
      VectorFns.cosine(col("a"), col("b")).as("hof")).collect()
  }

  test("null semantics match the HOF form: length mismatch and null elements → NULL") {
    val out = run(Seq(
      Row(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),          // clean
      Row(Seq(1.0f, 2.0f), Seq(1.0f)),                 // length mismatch
      Row(Seq(1.0f, null), Seq(1.0f, 2.0f)),           // null element
      Row(null, Seq(1.0f, 2.0f))))                     // null array
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(2), s"fused vs HOF null disagree: $r")
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(2), "fused == HOF bit-for-bit")
    }
    assert(!out(0).isNullAt(0) && out.drop(1).forall(_.isNullAt(0)))
  }

  test("zero vector: fused form yields NaN; ANSI HOF form errors (documented)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)))), schema)
    val fused = df.select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c")).collect()
    assert(fused.head.getDouble(0).isNaN)
    // under ANSI mode the composable Divide raises DIVIDE_BY_ZERO — the
    // deviation FuseCosineRule documents (it rescues this into NaN)
    val ex = intercept[Exception] {
      df.select(VectorFns.cosine(col("a"), col("b")).as("c")).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("topK with NaN scores matches the window sort (NaN ranks first)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, 0.9, 10L), (1L, Double.NaN, 11L), (1L, 0.5, 12L), (1L, Double.NaN, 13L)
    ).toDF("g", "score", "id").repartition(4)
    val viaAgg = df.groupBy("g").agg(TopKByScore.topK(col("score"), col("id"), 3).as("t"))
      .select(posexplode(col("t"))).select("col.id")
      .collect().map(_.getLong(0)).toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWin = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy("rk").select("id").collect().map(_.getLong(0)).toSeq
    assert(viaAgg == viaWin, s"agg=$viaAgg win=$viaWin")
    assert(viaAgg == Seq(11L, 13L, 10L), "NaN first (tie on id), then 0.9")
  }
}
