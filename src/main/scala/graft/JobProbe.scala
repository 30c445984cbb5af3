package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-time breakdown for one query evaluation — where
  * StageProbe counts stages, this shows WHICH jobs (CC rounds, checksum
  * collects, checkpoint materializations…) carry the wall-clock. Runs the
  * query once at the warm dir, then once timed at the SF dir with a job
  * listener; prints each job's duration, stage count and task count plus the
  * gaps BETWEEN jobs (driver-side planning/analysis time).
  *
  * Usage: runMain graft.JobProbe <queryName> [sfDir]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    val fn = SparkEntry.queries(name)
    def run(dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    run(warmDir) // codegen/JIT warmup
    run(sfDir)   // memo warmup at the timed dir
    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
                            var stages: Int = 0, var tasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs(e.jobId) = JobRec(e.jobId, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1; j.tasks += e.stageInfo.numTasks
        }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    run(sfDir)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(l)
    var prevEnd = -1L
    var jobSum = 0.0
    var gapSum = 0.0
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      val dur = (j.end - j.start) / 1e3
      val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
      jobSum += math.max(dur, 0); gapSum += math.max(gap, 0)
      println(f"[job] id=${j.id}%3d dur=${dur}%6.3fs gapBefore=${gap}%6.3fs stages=${j.stages}%2d tasks=${j.tasks}%3d")
      prevEnd = math.max(prevEnd, j.end)
    }
    println(f"[job] TOTAL wall=${wall}%.2fs jobs=${jobs.size} jobSum=${jobSum}%.2fs gapSum=${gapSum}%.2fs")
    spark.stop()
  }
}
