package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print formatted physical plans + shuffle/codegen counts for
  * selected queries (all, or names passed as args). The per-round plan
  * review the scale brief demands — run after adding operators.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          val df = fn(spark, sfDir)
          // collect() runs df's OWN QueryExecution (count()/noop-write plan
          // a different query), so AQE finalizes and codegen markers appear.
          // SPARK_GRAFT_PLAN_ONLY=1 skips execution: the INITIAL plan's
          // exchange counts are static and deterministic — the form the
          // plan-budget regression spec pins.
          if (!sys.env.contains("SPARK_GRAFT_PLAN_ONLY")) df.collect()
          val plan = df.queryExecution.executedPlan.toString
          val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r.findAllIn(plan).length
          val reused = "ReusedExchange".r.findAllIn(plan).length
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val codegens = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
          val pushed = plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")
          println(s"== $name: shuffles=$shuffles reused=$reused bhj=$bhj codegenSpans=$codegens pushedFilters=$pushed")
          if (args.nonEmpty) println(plan)
        } catch { case e: Throwable => println(s"== $name: ERROR ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
