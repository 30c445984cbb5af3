package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed cogroup: two keyed datasets merged group-by-group in ONE
  * co-partitioned pass (`KeyValueGroupedDataset.cogroup`) — the API for
  * per-key logic that needs BOTH sides' full groups at once, where a join
  * would materialize the per-key cross product and re-aggregate it.
  *
  * Scale: both inputs hash-shuffle once on the key; each group streams
  * through the merge function as iterators. Only use when the per-key
  * logic truly needs both groups together — plain aggregates compose
  * cheaper relationally (q67 computes a similar funnel with joins, which
  * Catalyst can optimize; this form exists for the semantics joins can't
  * express without a blowup).
  */
object CoGroup {

  final case class UserConversion(user_id: Long, n_clicks: Long, n_purchases: Long,
                                  purchased_after_click: Boolean)

  /** Per-user conversion facts needing both event groups at once: click
    * count, purchase count, and whether ANY purchase is at-or-after the
    * first click — one pass per key, no join product. */
  def userConversions(clicks: DataFrame, purchases: DataFrame): Dataset[UserConversion] = {
    import clicks.sparkSession.implicits._
    val c = clicks.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].groupByKey(_._1)
    val p = purchases.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].groupByKey(_._1)
    c.cogroup(p) { (user, cs, ps) =>
      var nClicks = 0L
      var firstClick: java.sql.Timestamp = null
      cs.foreach { case (_, t) =>
        nClicks += 1
        if (firstClick == null || t.before(firstClick)) firstClick = t
      }
      var nPurch = 0L
      var after = false
      ps.foreach { case (_, t) =>
        nPurch += 1
        if (firstClick != null && !t.before(firstClick)) after = true
      }
      Iterator.single(UserConversion(user, nClicks, nPurch, after))
    }
  }
}
