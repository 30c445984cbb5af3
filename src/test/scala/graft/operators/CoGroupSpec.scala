package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class CoGroupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cogroup merges both event groups per key in one pass") {
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 09:00:00")),  // earlier first click
      (3L, ts("2024-01-01 11:00:00"))   // clicker with no purchases
    ).toDF("user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:30:00")),  // after user 1's first click
      (2L, ts("2024-01-01 08:00:00"))   // purchaser with no clicks
    ).toDF("user_id", "ts")
    val out = CoGroup.userConversions(clicks, purchases).collect()
      .map(u => u.user_id -> u).toMap
    assert(out(1L).n_clicks == 2 && out(1L).n_purchases == 1 && out(1L).purchased_after_click)
    assert(out(3L).n_clicks == 1 && out(3L).n_purchases == 0 && !out(3L).purchased_after_click)
    assert(out(2L).n_clicks == 0 && out(2L).n_purchases == 1 &&
      !out(2L).purchased_after_click, "purchase with no click never counts as converted")
    assert(out.size == 3)
  }

  test("cogroup conversion counts agree with the relational funnel on real events") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id", "ts")
    val cg = CoGroup.userConversions(clicks, purchases).collect()
    val converted = cg.count(_.purchased_after_click)
    // relational mirror: first click per user, any purchase at-or-after it
    val c = clicks.groupBy("user_id").agg(min(col("ts")).as("fc"))
    val rel = purchases.join(c, Seq("user_id"))
      .filter(col("ts") >= col("fc"))
      .select("user_id").distinct().count()
    assert(converted.toLong == rel, s"cogroup=$converted relational=$rel")
    assert(cg.map(_.user_id).distinct.length == cg.length, "one row per user")
  }
}
