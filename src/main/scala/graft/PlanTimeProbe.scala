package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query driver-side plan cost — construct + analyze +
  * optimize each declared query (no execution for lazily-constructed
  * queries) and rank by wall time. Queries whose BUILD is eager (the
  * ConstructionSweep allowlist) still run their build jobs; interpret those
  * rows as build+plan. Two sweeps: the second shows the warm-session cost
  * the 2nd/3rd bench passes pay.
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(tag: String): Unit = {
      val times = SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.optimizedPlan; () }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
      val total = times.map(_._2).sum
      println(f"[plantime] $tag total=${total}%.2f s")
      times.sortBy(-_._2).take(25).foreach { case (n, t) =>
        println(f"[plantime] $tag $n ${t}%.3f")
      }
    }
    sweep("cold")
    sweep("warm")
    spark.stop()
  }
}
