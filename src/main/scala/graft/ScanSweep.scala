package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

object ScanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
          val self = p match {
            case f: FileSourceScanExec =>
              Seq(f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
            case a: AdaptiveSparkPlanExec => scans(a.inputPlan)
            case _ => Nil
          }
          self ++ p.children.flatMap(scans) ++
            p.subqueries.flatMap(scans)
        }
        val counts = scans(plan).groupBy(identity).view.mapValues(_.size).toMap
        val multi = counts.filter(_._2 > 1)
        if (multi.nonEmpty)
          println(s"MULTI $name ${multi.map { case (t, n) => s"$t=$n" }.mkString(",")}")
      } catch { case e: Throwable => println(s"MULTI_ERR $name ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
