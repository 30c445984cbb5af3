package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink-side layout control: at 100 TB the number and size of output files
  * is a first-order concern (a million 1 MB files kills the next scan's
  * planning; one 100 GB file kills parallelism).
  */
object Sinks {

  /** Write parquet with bounded file sizes: `targetFiles` output partitions,
    * each further split at `maxRecordsPerFile` rows — both knobs the
    * planner can't infer on its own.
    *
    * Always one round-robin repartition: probing the current partition count
    * (`df.rdd.getNumPartitions`) would force AQE to EXECUTE every upstream
    * stage just to pick coalesce-vs-repartition, doubling job cost; a single
    * predictable shuffle is the cheaper contract for a sink utility.
    */
  def writeParquetSized(df: DataFrame, path: String, targetFiles: Int,
                        maxRecordsPerFile: Long = 5000000L): Unit = {
    df.repartition(targetFiles).write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(path)
  }

  /** Write parquet sorted within files by `sortCols` — clusters values so
    * parquet row-group min/max statistics prune effectively on those
    * columns (poor man's Z-order for a single sort dimension). */
  def writeParquetClustered(df: DataFrame, path: String, partitions: Int,
                            sortCols: Seq[String]): Unit = {
    df.repartition(partitions)
      .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** ORC sink (Spark's second built-in columnar format — Hive-ecosystem
    * interchange) with the SAME layout bounds as the parquet sized writer:
    * target file count plus a rows-per-file ceiling. Same pushdown/pruning
    * machinery as parquet: ORC stripes carry min/max statistics and the
    * scan reports `PushedFilters`. */
  def writeOrc(df: DataFrame, path: String, targetFiles: Int,
               maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(targetFiles).write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .orc(path)

  /** ORC scan (lazy; filters/projection push into the stripe reader). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
