package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY §4 / scale brief: "bucketing for co-located
  * joins"). Writing both fact tables bucketed by the join key lets every
  * subsequent join/aggregation on that key run WITHOUT an exchange — at
  * 100 TB this converts the recurring shuffle of a hot join into a one-time
  * layout cost.
  *
  * Spark-native bucketing (no Hive metastore): `bucketBy` + `saveAsTable`
  * registers the layout in the session catalog; readers pick it up
  * transparently.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — planner sees the
    * matching output partitionings and elides both exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
