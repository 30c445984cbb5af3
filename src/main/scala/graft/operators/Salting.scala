package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual counterpart to AQE's runtime
  * skew-join splitting: [[saltedSumCount]] for when a single group key
  * dominates an AGGREGATION (AQE only rebalances joins), [[saltedJoin]] for
  * when the join itself must pre-split hot keys (AQE's skew split works on
  * sort-merge joins post-shuffle; the salted form bounds the per-reducer
  * share BEFORE the shuffle and also covers the shuffled-hash path).
  *
  * Aggregation is two-phase: aggregate on (key, salt) first — hot keys fan
  * out over `buckets` reducers — then combine the partials per key. Correct
  * for any decomposable aggregate (sum/count/min/max); the per-phase decimal
  * sums keep results identical to the one-shot aggregation.
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

  /** Skew-salted equi-join: the SMALL side is replicated `buckets` ways and
    * the FACT side's rows spread over the replicas by a salt derived from
    * `saltSrc`, so one hot join key's rows land on `buckets` reducers
    * instead of one. Row-identical to `fact.join(small, key)` — every fact
    * row meets exactly one replica of its key's small-side row (inner-join
    * semantics; `small` must be unique per key, the dimension contract).
    *
    * `saltSrc` must be a deterministic per-row expression on the FACT side
    * (an id column, NOT rand/partition-id) so results are reproducible and
    * layout-independent; uniformity, not determinism, is what spreads the
    * load. Use when the small side is too large to broadcast and a key is
    * hot enough that a plain shuffle serializes it through one task —
    * the replication cost is |small| × buckets rows, traded against the
    * hot reducer. If `small` has duplicate rows per key, output duplicates
    * amplify exactly as in the plain join (inner-join semantics) — the
    * dimension-uniqueness contract is about meaning, not correctness of
    * the rewrite. Neither input may already carry a `__salt` column: the
    * working column would silently collide (fact-side replaced, join then
    * pairing unrelated salts), so that is rejected up front. */
  def saltedJoin(fact: DataFrame, small: DataFrame, key: String,
                 saltSrc: Column, buckets: Int = 16): DataFrame = {
    require(!fact.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the input first")
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSrc), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
