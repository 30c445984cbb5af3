package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    for (name <- args.drop(1)) {
      val stages = new AtomicInteger(); val tasks = new AtomicInteger()
      val bytes = new java.util.concurrent.atomic.AtomicLong()
      val l = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
          bytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$name ERR ${e.getClass.getSimpleName}") }
      Thread.sleep(800)
      spark.sparkContext.removeSparkListener(l)
      println(f"$name STAGES=${stages.get} TASKS=${tasks.get} MB=${bytes.get/1e6}%.1f SEC=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
