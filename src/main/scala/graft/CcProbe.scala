package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: time Dedup.connectedComponents in isolation on q123's edge
  * set (exact cosine pairs over vec_id < 200) and on q218's banded LSH
  * candidate set, printing wall seconds per evaluation. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = sources.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200)
    val edges = operators.Similarity.cosinePairs(emb, minCosine = 0.3)
      .select("id_a", "id_b").localCheckpoint(eager = true)
    for (v <- Seq("a", "b", "c", "d"); _ <- 1 to 2) { // JIT warmup across all variants
      System.setProperty("graft.cc.variant", v)
      operators.Dedup.connectedComponents(edges).count()
    }
    for (v <- Seq("a", "b", "c", "d", "a", "b", "c", "d"); i <- 1 to reps) {
      System.setProperty("graft.cc.variant", v)
      val t0 = System.nanoTime()
      val cc = operators.Dedup.connectedComponents(edges)
      val n = cc.count()
      println(f"[cc] variant=$v rep$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
