package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: inclusive ties, latest-prior match, null when no prior") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),  // before any right row
      (4L, 10L, ts("2024-01-01 11:00:00"))   // exactly at a right ts (tie)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100.0),
      (10L, ts("2024-01-01 11:00:00"), 200.0),
      (20L, ts("2024-01-01 09:30:00"), 300.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("value"))
      .orderBy("event_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Double]("asof_value") == 100.0, "10:00 matches 09:30")
    assert(out(1).getAs[Double]("asof_value") == 200.0, "12:00 matches 11:00")
    assert(out(2).isNullAt(out(2).fieldIndex("asof_value")), "no prior -> null")
    assert(out(3).getAs[Double]("asof_value") == 200.0, "tie at 11:00 is inclusive")
    assert(out(1).getAs[Timestamp]("asof_ts") == ts("2024-01-01 11:00:00"))
  }

  test("genuine NULL right values come from the matched row, not an older one") {
    // the matched (most recent) right row carries value=NULL, tag='b'; a
    // per-column last(ignoreNulls) would fall back to the OLDER row's 100.0
    // and mix columns from different right rows — DuckDB ASOF carries the
    // single matched row, NULLs included
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), Option(100.0), Option("a")),
      (10L, ts("2024-01-01 11:00:00"), Option.empty[Double], Option("b"))
    ).toDF("user_id", "ts", "value", "tag")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("value", "tag"))
      .collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_value")),
      "matched row's NULL value must be preserved, not replaced by an older row")
    assert(out(0).getAs[String]("asof_tag") == "b",
      "all carried columns come from the single matched row")
    assert(out(0).getAs[Timestamp]("asof_ts") == ts("2024-01-01 11:00:00"))
  }
}
