package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("topK: bounded, sorted best-first, deterministic tie-break, merges across partitions") {
    val df = (1L to 1000L).map(i => (i % 7, (i % 13).toDouble, i)).toDF("g", "score", "id")
      .repartition(8) // force partial buffers + merge + serde
    val out = df.groupBy("g").agg(TopKByScore.topK(col("score"), col("id"), 5).as("topk"))
      .collect()
    assert(out.length == 7)
    out.foreach { r =>
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
      assert(entries.length == 5)
      val scores = entries.map(_.getDouble(0))
      assert(scores == scores.sorted.reverse, "best-first")
      assert(scores.head == 12.0)
      // ties (same score) break toward the smaller id
      val tied = entries.filter(_.getDouble(0) == 12.0).map(_.getLong(1))
      assert(tied == tied.sorted)
    }
  }

  test("topK with k larger than group size returns the whole group") {
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L)).toDF("g", "score", "id")
    val entries = df.groupBy("g").agg(TopKByScore.topK(col("score"), col("id"), 5).as("t"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
    assert(entries.map(_.getLong(1)) == Seq(10L, 11L))
  }

  test("aggregate matches the window-form top-k exactly") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i % 5, math.sin(i.toDouble), i)).toDF("g", "score", "id")
    val viaAgg = df.groupBy("g").agg(TopKByScore.topK(col("score"), col("id"), 3).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("pos"), col("col.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("g"), (col("rk") - 1).as("pos"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }
}
