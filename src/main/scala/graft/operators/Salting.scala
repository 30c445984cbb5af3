package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the manual counterpart to AQE's runtime
  * skew-join splitting, for when a single group key dominates an
  * AGGREGATION — AQE only rebalances joins).
  *
  * Two-phase: aggregate on (key, salt) first — hot keys fan out over
  * `buckets` reducers — then combine the partials per key. Correct for any
  * decomposable aggregate (sum/count/min/max); the per-phase decimal sums
  * keep results identical to the one-shot aggregation.
  */
object Salting {

  /** Salted sum/count aggregation: returns (keyCols..., n_rows, sum_<valCol>). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valCol: String,
                     buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col(valCol).cast("decimal(18,2)")).as("__s"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        sum(col("__s")).cast("double").as(s"sum_$valCol"))
  }
}
