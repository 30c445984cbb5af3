package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inclusive bounds, key isolation, and cross-bin matches") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),  // offset 0 → inclusive
      (10L, ts("2024-01-01 10:30:00"), 2.0),  // exactly upper → inclusive (next bin: 10:30 starts a new 1800s bucket)
      (10L, ts("2024-01-01 10:30:01"), 3.0),  // past upper → out
      (10L, ts("2024-01-01 09:59:59"), 4.0),  // before lower → out
      (20L, ts("2024-01-01 10:10:00"), 5.0)   // other key → out
    ).toDF("user_id", "ts", "value")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts", 0L, 1800L, Seq("value"))
      .collect().map(_.getAs[Double]("r_value")).toSet
    assert(out == Set(1.0, 2.0), s"got $out")
  }

  test("negative lower bound gives a look-back window") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:55:00"), 1.0),  // 5 min before → in
      (10L, ts("2024-01-01 10:05:00"), 2.0),  // 5 min after → in
      (10L, ts("2024-01-01 09:49:00"), 3.0)   // 11 min before → out
    ).toDF("user_id", "ts", "value")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts", -600L, 600L, Seq("value"))
      .collect().map(_.getAs[Double]("r_value")).toSet
    assert(out == Set(1.0, 2.0), s"got $out")
  }

  test("rejects inputs whose columns collide with generated names") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"), 0L))
      .toDF("event_id", "user_id", "ts", "r_ts")
    val right = Seq((10L, ts("2024-01-01 10:00:00"), 1.0)).toDF("user_id", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts", 0L, 1800L, Seq("value"))
    }
    assert(e.getMessage.contains("r_ts"))
    // carrying the right timestamp AS a value column would emit r_ts twice
    val left2 = left.drop("r_ts")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(left2, right, Seq("user_id"), "ts", "ts", 0L, 1800L, Seq("ts"))
    }
    assert(e2.getMessage.toLowerCase.contains("duplicate"), e2.getMessage)
  }

  test("plans as an equi-join on (key, bin) — never a nested-loop product") {
    val plan = EventQueries.q65RangeJoin.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected a hash-keyed join:\n$plan")
  }

  test("binned join is pair-for-pair identical to the naive inequality join") {
    // 300 events over 5 users at irregular offsets — every bin alignment
    // gets exercised, including same-timestamp duplicates
    val events = spark.range(300).select(
      col("id").as("event_id"),
      (col("id") % 5).as("user_id"),
      timestamp_micros(lit(1704100000000000L) + (col("id") * 97 % 211) * 60000000L).as("ts"),
      (col("id") % 7).cast("double").as("value"))
    val left = events.filter(col("event_id") % 3 === 0).select("event_id", "user_id", "ts")
    val right = events.select("user_id", "ts", "value")
    val binned = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts", 0L, 900L, Seq("value"))
      .select(col("event_id"), col("r_ts"), col("r_value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).sorted.toSeq
    val naive = left.as("l").join(right.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") && col("r.ts") <= col("l.ts") + expr("INTERVAL 900 SECONDS"))
      .select(col("l.event_id"), col("r.ts"), col("r.value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).sorted.toSeq
    assert(binned.nonEmpty && binned == naive,
      s"binned=${binned.size} naive=${naive.size}")
  }
}
