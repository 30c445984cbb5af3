package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query repeatedly against a chosen SF dir.
  * `runMain graft.TimeQuery <queryName> [sfDir] [reps]` — prints per-rep
  * seconds so a single query can be profiled without a full Bench pass.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets the optimizer drop columns and
      // even whole joins, timing a different plan than Verify executes
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
