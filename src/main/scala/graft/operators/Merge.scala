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
}
