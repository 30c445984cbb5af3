package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Keyed upsert — the MERGE primitive of nightly table maintenance: rows
  * from `updates` win over same-key `target` rows, unmatched target rows
  * pass through, new update keys append.
  *
  * Shape at scale: one LEFT ANTI join on the key plus a union — no window,
  * no global sort, and the anti join's build side is the key PROJECTION of
  * the delta, so it broadcasts whenever the nightly batch's key set fits an
  * executor even if its payload doesn't. The corpus side never shuffles
  * under a broadcast anti join. Pair with a partitioned layout
  * ([[graft.sources.Sinks.writeParquetPartitioned]]) to rewrite only the
  * partitions the delta touches.
  *
  * Contract: `updates` is unique per key (the dimension contract — enforce
  * upstream with [[Dedup.exact]] if unsure) and shares `target`'s schema;
  * unionByName reconciles column order.
  */
object Merge {
  def upsert(target: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    target.join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(updates)

  /** Type-2 slowly-changing-dimension apply — the history-preserving MERGE
    * of dimension maintenance: for each delta key, the CURRENT history row
    * closes (`valid_to` = effective − 1 day, `is_current` = false) and the
    * delta row appends as the new current generation (`valid_from` =
    * effective, open `valid_to`); prior closed generations and untouched
    * keys pass through byte-identical. A delta key absent from history is
    * a plain insert (nothing to close).
    *
    * Contract: `history` carries (`valid_from` DATE, `valid_to` DATE
    * nullable, `is_current` BOOLEAN); `delta` is unique per key, shares
    * the attribute columns, and carries `effectiveCol` (DATE). Shape at
    * scale: three key-joins against the DELTA's key projection — each
    * broadcastable whenever the nightly batch's key set fits an executor —
    * plus unions; the dimension never shuffles under broadcast joins and
    * there is no window (the "close the latest generation" step rides the
    * `is_current` flag, not a rank over versions). */
  def scd2Apply(history: DataFrame, delta: DataFrame, keyCol: String,
                effectiveCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dKeys = delta.select(col(keyCol), col(effectiveCol).as("__eff"))
    val untouched = history.join(dKeys.select(keyCol), Seq(keyCol), "left_anti")
    val priorClosed = history.filter(!col("is_current"))
      .join(dKeys.select(keyCol), Seq(keyCol), "left_semi")
    val closed = history.filter(col("is_current"))
      .join(dKeys, Seq(keyCol))
      .withColumn("valid_to", date_sub(col("__eff"), 1))
      .withColumn("is_current", lit(false))
      .drop("__eff")
    val fresh = delta
      .withColumn("valid_from", col(effectiveCol))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .drop(effectiveCol)
    untouched.unionByName(priorClosed).unionByName(closed).unionByName(fresh)
  }
}
