package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench for a SUBSET of queries: same noop-sink methodology
  * as [[Bench]] (full row evaluation, zero sink cost, warmup at sf0.001)
  * without paying the full 200+-query sweep to time three queries.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QBench q198_join_card_est,q207_chapman_coverage"
  * Prints per-query seconds for `passes` timed passes (default 2).
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // QBENCH_EXPLAIN=1: dump the POST-EXECUTION (AQE-final) plan — the
      // only place ReusedExchange/ReusedSubquery decisions are visible
      if (sys.env.get("QBENCH_EXPLAIN").contains("1") && dir == sfDir)
        println(s"[qbench-plan] $name\n" + df.queryExecution.executedPlan.toString)
      dt
    }
    names.foreach(n => run(n, warmDir)) // codegen/JIT warmup
    (1 to passes).foreach { p =>
      val line = names.map(n => f"$n=${run(n, sfDir)}%.2f").mkString(" ")
      println(s"[qbench] pass $p: $line")
    }
    spark.stop()
  }
}
