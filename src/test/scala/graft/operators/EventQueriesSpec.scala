package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Pins session_window gap semantics at the exact boundary, empirically:
  * Spark MERGES a session whose end touches the next event's start — an
  * event at exactly prev+gap extends the session; only a strictly larger
  * gap opens a new one. The q61 oracle therefore marks a new session on
  * `ts - prev > gap` (strict), and this spec fails if Spark's semantics
  * ever drift to right-exclusive windows.
  */
class EventQueriesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("exact-gap event merges; strictly-larger gap opens a new session") {
    import spark.implicits._
    val events = Seq(
      // u1: second event at exactly +10min => still ONE session
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:10:00")),
      // u2: second event 1ms past the gap => TWO sessions
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:10:00.001")),
      // u3: second event inside the gap => one session
      (3L, ts("2024-01-01 00:00:00")),
      (3L, ts("2024-01-01 00:09:59"))
    ).toDF("user_id", "ts")
    val sessions = events
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start"), col("n_events"))
      .collect()
    val byUser = sessions.groupBy(_.getAs[Long]("user_id"))
    assert(byUser(1L).length == 1, s"exact-gap event must merge: ${sessions.mkString(",")}")
    assert(byUser(2L).length == 2, s"past-gap event must open a new session: ${sessions.mkString(",")}")
    assert(byUser(3L).length == 1, s"sub-gap event must merge: ${sessions.mkString(",")}")
    // mirror of the q61 oracle condition (STRICT > gap => new session)
    val gapMs = 10 * 60 * 1000L
    val fixtures = Map(
      1L -> Seq("2024-01-01 00:00:00", "2024-01-01 00:10:00"),
      2L -> Seq("2024-01-01 00:00:00", "2024-01-01 00:10:00.001"),
      3L -> Seq("2024-01-01 00:00:00", "2024-01-01 00:09:59"))
    val oracleCounts = fixtures.map { case (u, tss) =>
      val t = tss.map(ts(_).getTime)
      u -> t.zip((t.head - gapMs - 1) +: t.dropRight(1)).count { case (cur, prev) => cur - prev > gapMs }
    }
    assert(oracleCounts == Map(1L -> 1, 2L -> 2, 3L -> 1),
      "oracle strict-> formulation agrees with Spark at the boundary")
  }

  test("q54: a zero-variance group yields no outliers instead of an ANSI divide error") {
    import spark.implicits._
    // "const" has n >= 2 all-equal values (std_v = 0) — without the
    // std_v > 0 guard the z-score divide raises DIVIDE_BY_ZERO under this
    // project's ANSI mode. "var" plants exactly one |z| > 2 outlier
    // (mean 10, std ~31.6, z(100) ~2.85).
    val rows = (1L to 3L).map(i => (i, "const", 7.5, ts("2024-01-01 00:00:00"))) ++
      (4L to 12L).map(i => (i, "var", 0.0, ts("2024-01-01 00:00:00"))) :+
      (13L, "var", 100.0, ts("2024-01-01 00:00:00"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q54").toString
    rows.toDF("event_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.q54GroupOutliers.build(spark, dir).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(13L))
    assert(out.head.getAs[Double]("z") > 2)
  }

  test("q92: hand-computed transition matrix on a planted two-user log") {
    import spark.implicits._
    // user 1: A→B→A (transitions A→B, B→A); user 2: B→B (transition B→B).
    // Matrix: A→B p=1.0 (n_from(A)=1); B→A and B→B p=0.5 each (n_from(B)=2).
    val rows = Seq(
      (1L, 10L, "A", ts("2024-01-01 00:00:00")),
      (2L, 10L, "B", ts("2024-01-01 00:01:00")),
      (3L, 10L, "A", ts("2024-01-01 00:02:00")),
      (4L, 20L, "B", ts("2024-01-01 00:00:00")),
      (5L, 20L, "B", ts("2024-01-01 00:01:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft_q92").toString
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.q92EventTransitions.build(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Long]("n_from"), r.getAs[Double]("p_trans"))).toMap
    assert(out == Map(
      ("A", "B") -> (1L, 1L, 1.0),
      ("B", "A") -> (1L, 2L, 0.5),
      ("B", "B") -> (1L, 2L, 0.5)))
  }

  test("q98: planted journeys — path truncates at 3, short timelines keep their length") {
    import spark.implicits._
    // user 1: A,B,A,C → first-3 path A>B>A (4th event ignored);
    // user 2: B,B → path B>B; user 3: C → path C.
    val rows = Seq(
      (1L, 10L, "A", ts("2024-01-01 00:00:00")),
      (2L, 10L, "B", ts("2024-01-01 00:01:00")),
      (3L, 10L, "A", ts("2024-01-01 00:02:00")),
      (4L, 10L, "C", ts("2024-01-01 00:03:00")),
      (5L, 20L, "B", ts("2024-01-01 00:00:00")),
      (6L, 20L, "B", ts("2024-01-01 00:01:00")),
      (7L, 30L, "C", ts("2024-01-01 00:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft_q98").toString
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.q98EventPaths.build(spark, dir).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map("A>B>A" -> 1L, "B>B" -> 1L, "C" -> 1L))
  }

  test("q111: co-occurrence counts bounded by marginals; lift recovers one user total") {
    val rows = EventQueries.q111Cooccurrence.build(spark, sf).collect()
    assert(rows.nonEmpty)
    val ns = rows.map { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(nab <= math.min(na, nb), "intersection bounded by both marginals")
      val support = r.getAs[Double]("support")
      assert(support > 0 && support <= 1.0)
      // N = lift·n_a·n_b / n_ab must be the same integer user count on every row
      r.getAs[Double]("lift") * na * nb / nab
    }
    ns.foreach(n => assert(math.abs(n - ns.head) < 1e-6 * ns.head, "inconsistent user total"))
  }

  test("q114: MAD fences are resistant — outliers stay a small minority of each group") {
    val rows = EventQueries.q114RobustOutliers.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, out) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_outliers"))
      assert(out < n, "a fence that flags everything is no fence")
      assert(r.getAs[Double]("mad") >= 0 &&
        r.getAs[Double]("outlier_rate") == out.toDouble / n.toDouble)
    }
  }

  test("q117: every sketch lands inside its accuracy envelope against the exact twin") {
    // sf0.01, not the sf0.001 fixture: the spec-scale groups sit entirely
    // below both sketch cutoffs (15 distinct users ≤ k=64, ~200 rows ≤
    // 1024-sample), where estimate ≡ exact and the envelope assert would
    // be vacuous; at sf0.01 both approximation branches are live. Resolved
    // as the sf fixture's SIBLING (not a hardcoded absolute path) and
    // skipped with a clear message where that scale wasn't generated.
    val sf001 = new java.io.File(new java.io.File(sf).getParentFile, "sf0.01")
    assume(sf001.isDirectory, s"sf0.01 fixture not present at $sf001 — skipping envelope test")
    val rows = EventQueries.q117SketchReport.build(spark, sf001.getPath).collect()
    assert(rows.length == 15, "3 metrics x 5 event types")
    rows.foreach { r =>
      val (m, e) = (r.getAs[String]("metric"), r.getAs[Double]("rel_err"))
      // KMV with k=64 carries ~1/√62 ≈ 13% typical error; the 1024-row
      // hash-sample percentile lands within a few percent on ~2000-row
      // groups — bounds sized to the estimators, not tuned to the fixture
      val bound = if (m == "distinct_users") 0.25 else 0.15
      assert(e >= 0 && e < bound,
        s"$m/${r.getAs[String]("event_type")}: rel_err $e outside $bound")
      assert(r.getAs[Double]("exact") > 0 && r.getAs[Double]("approx") > 0)
    }
    // the approximation branches actually fired: at least one nonzero error
    assert(rows.exists(_.getAs[Double]("rel_err") > 0), "sketch branches not exercised")
  }

  test("q130: bounds on the driver table; planted linear series correlate EXACTLY 1") {
    import spark.implicits._
    val rows = EventQueries.q130SeriesCorrelation.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") >= 2)
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0, s"corr out of [-1,1]: $c")
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"), "ordered pairs only")
    }
    // planted: series B = 2·A day for day, integer-valued → the exact
    // sufficient statistics give corr == 1.0 BIT-EXACTLY (num = 2A and
    // dx·dy = √A·√(4A) = 2√A·√A with power-of-two scaling, so IEEE sqrt
    // introduces no error the division doesn't cancel)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val planted = (0 until 10).flatMap { d =>
      val t = new java.sql.Timestamp(ts0.getTime + d * 86400000L)
      Seq((t, "a", (d + 1) * 3.0), (t, "b", (d + 1) * 6.0))
    }.toDF("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_q130").toString
    planted.write.parquet(s"$dir/events.parquet")
    val out = EventQueries.q130SeriesCorrelation.build(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("corr") == 1.0, s"exact: ${out.head}")
    assert(out.head.getAs[Long]("n") == 10)
  }

  test("q92: probabilities sum to 1 per source state; transition count = events − users") {
    val ev = graft.sources.Tables.events(spark, sf)
    val out = EventQueries.q92EventTransitions.build(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_trans")).sum ==
      ev.count() - ev.select("user_id").distinct().count(),
      "every event except each user's first contributes exactly one transition")
    out.groupBy(_.getAs[String]("prev_type")).foreach { case (prev, rows) =>
      val sum = rows.map(_.getAs[Double]("p_trans")).sum
      assert(math.abs(sum - 1.0) < 1e-9, s"p_trans out of $prev sums to $sum")
      assert(rows.map(_.getAs[Long]("n_trans")).sum == rows.head.getAs[Long]("n_from"))
    }
  }

  test("attribution conserves purchases and never over-credits") {
    val rows = graft.SparkEntry.queries("q139_attribution")(spark, sf).collect()
    val byType = rows.map(r => r.getAs[String]("touch_type") ->
      (r.getAs[Long]("n_purchases"), r.getAs[Long]("credit_micros"))).toMap
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
    val total = purchases.count()
    // every purchase is either attributed (to >= 1 touch types) or in '(none)'
    val attributedTypes = byType.keys.filter(_ != "(none)")
    assert(attributedTypes.nonEmpty && byType.contains("(none)"))
    assert(byType("(none)")._1 <= total)
    // truncated integer credits can never exceed the exact total value
    val totalMicros = purchases
      .agg(sum((round(col("value") * 100).cast("long") * lit(1000000L))
        .cast("decimal(38,0)")))
      .head.getDecimal(0)
    val credited = rows.map(_.getAs[Long]("credit_micros"))
      .map(java.math.BigDecimal.valueOf).reduce(_ add _)
    assert(credited.compareTo(totalMicros) <= 0)
  }

  test("q155 Theil-Sen matches an independent Scala reference") {
    val days = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getDecimal(2)))
    val want = days.groupBy(_._1).map { case (t, rows) =>
      val slopes = (for {
        Seq((_, da, va), (_, db, vb)) <- rows.sortBy(_._2).toSeq.combinations(2)
      } yield vb.subtract(va).doubleValue() / (db - da).toDouble).toSeq.sorted
      val n = slopes.length
      val med = if (n % 2 == 1) slopes(n / 2)
        else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
      t -> (n.toLong, med)
    }
    val got = graft.SparkEntry.queries("q155_trend_robust")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_slopes"), r.getAs[Double]("theil_sen_slope")))
      .toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (t, (n, m)) =>
      assert(n === want(t)._1)
      assert(math.abs(m - want(t)._2) < 1e-12, s"$t: $m vs ${want(t)._2}")
    }
  }

  test("q159 OLS matches an independent Scala least-squares reference; R2 bounded") {
    val days = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getDecimal(2).doubleValue()))
    val d0 = days.map(_._2).min
    val want = days.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.map(r => (r._2 - d0).toDouble)
      val ys = rows.map(_._3)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      t -> (slope, intercept)
    }
    val got = graft.SparkEntry.queries("q159_ols_trend")(spark, sf).collect()
    got.foreach { r =>
      val t = r.getString(0)
      assert(math.abs(r.getAs[Double]("slope") - want(t)._1) < 1e-6, t)
      assert(math.abs(r.getAs[Double]("intercept") - want(t)._2) < 1e-6, t)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"$t r2=$r2")
    }
    assert(got.nonEmpty)
  }
}
