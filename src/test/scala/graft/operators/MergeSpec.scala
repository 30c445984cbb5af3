package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  test("upsert: updates win, unmatched targets pass through, new keys append") {
    import spark.implicits._
    val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n")
    val updates = Seq((2L, "B", 99L), (4L, "d", 40L)).toDF("id", "v", "n")
    val out = Merge.upsert(target, updates, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "a", 10L),   // passthrough
      (2L, "B", 99L),   // update wins
      (3L, "c", 30L),   // passthrough
      (4L, "d", 40L)))  // append
  }

  test("upsert anti join broadcasts the delta's key projection") {
    import spark.implicits._
    val target = spark.range(0, 10000).select(col("id"), (col("id") % 7).as("n"))
    val updates = spark.range(0, 100).select(col("id"), lit(-1L).as("n"))
    val plan = Merge.upsert(target, updates, "id")
      .queryExecution.executedPlan.toString
    // the corpus side must not shuffle: the batch-sized delta key set
    // builds a broadcast anti join
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti join:\n$plan")
  }
}
