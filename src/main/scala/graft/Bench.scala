package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 first-touches codegen/JIT for every query's
  * expression tree so the timed pass measures steady-state operator cost,
  * not one-time compilation (standard JVM benchmarking practice; the
  * reported numbers are the timed pass only).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize through the noop sink, NOT count(): under count() the
    // optimizer prunes every output column and can eliminate whole joins
    // (a distinct-keyed left join followed by a group-on-left-key collapses
    // to the left side), so count() was timing plans that skipped the very
    // work being benchmarked. The noop write evaluates every output row in
    // full with zero sink cost.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn(spark, warmDir)) catch { case _: Throwable => () }
    }

    // best-of-2 per query: steady-state operator cost, not GC/scheduler
    // noise. A failing query reports -1 (unmistakable), not its elapsed.
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // System 1-min load average sampled around the timed passes: BENCH_r09
    // read 81.2 s under end-of-round machine contention while the same code
    // measured 48.6 s idle — the load fields make a contaminated run
    // self-identifying instead of silently mislabeling a regression.
    // getSystemLoadAverage returns -1.0 where unsupported; reported as-is.
    def load1(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = load1()
    val p1 = timedPass()
    val p2 = timedPass()
    val loadAfter = load1()
    // ListMap keeps SparkEntry's insertion order so bench lines diff cleanly
    // across rounds
    val results = scala.collection.immutable.ListMap(
      SparkEntry.queries.keys.map { k =>
        val (a, b) = (p1(k), p2(k))
        k -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
      }.toSeq: _*)
    // The build log is tail-captured to its last 2000 chars downstream, and
    // anything after the JSON line (sbt's success banner) eats into that
    // window too — so the line must stay comfortably short or its HEAD gets
    // truncated and it never parses. Two levers: millisecond precision
    // (sub-ms digits are noise at bench scale) and the unique qNN prefix as
    // the query key (the full names cost ~15 chars × 70 queries; the
    // numbers are unique across the whole surface and map 1:1 to
    // SparkEntry.queries / CORRECTNESS rows).
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""load1_before":${fmt(loadBefore)},"load1_after":${fmt(loadAfter)}}"""
    println(line)
    // Also persist to a file: log-tail capture has truncated the printed
    // line before (BENCH parsed:null three rounds running) — the file is
    // the reliable channel, the stdout line stays for compatibility.
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // file write must never fail the bench
    spark.stop()
  }
}
