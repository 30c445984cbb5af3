package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate: expectation checks rendered as a (rule, n_violations)
  * report — the validation pass a production pipeline runs before promoting
  * a snapshot (great-expectations-style, re-expressed as Spark aggregates).
  *
  * Scale shape: all predicate rules fuse into ONE scan as conditional
  * counts (a single map-side-combined aggregate, no matter how many rules);
  * key uniqueness adds one distinct aggregate on the key column only; a
  * referential check is one null-producing left join counted on the miss
  * side. Nothing collects; the report is as wide as the rule list.
  */
object Quality {

  /** One row per predicate rule: how many rows violate it. All rules ride
    * a single aggregate over one scan; the wide 1-row result unpivots to
    * (rule, n_violations) via Expand — no second pass. */
  def predicateReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "predicateReport needs at least one rule")
    val wide = df.agg(
      sum(when(rules.head._2, 1L).otherwise(0L)).as(rules.head._1),
      rules.tail.map { case (n, p) => sum(when(p, 1L).otherwise(0L)).as(n) }: _*)
    wide.unpivot(Array.empty[Column], rules.map(r => col(r._1)).toArray,
        "rule", "n_violations")
  }

  /** Key-uniqueness rule: surplus rows beyond one per NON-NULL key value.
    * `count(key)` (not `count(*)`) so NULL-keyed rows are excluded from
    * both sides — countDistinct skips NULLs, and counting them on the raw
    * side would report a lone NULL-keyed row as a "duplicate". NULL keys
    * are a different defect; gate them with [[nullKeyCount]]. */
  def duplicateKeyCount(df: DataFrame, keyCol: String, rule: String): DataFrame =
    df.agg((count(col(keyCol)) - countDistinct(col(keyCol))).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))

  /** Null-key rule: rows whose key is NULL — the companion to
    * [[duplicateKeyCount]] so the two defect classes report separately. */
  def nullKeyCount(df: DataFrame, keyCol: String, rule: String): DataFrame =
    df.agg(sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))

  /** Referential-integrity rule: child rows whose foreign key has no match
    * in the parent's primary key (orphans), counted via a left anti join —
    * the parent side is its key projection, broadcastable when the parent
    * key set fits an executor. */
  def orphanCount(child: DataFrame, parent: DataFrame,
                  fkCol: String, pkCol: String, rule: String): DataFrame = {
    // same-named keys would make col(fk) === col(pk) ambiguous after the
    // join; rename the parent's key to a reserved name unconditionally
    require(!child.columns.contains("__qk"),
      "orphanCount reserves column name __qk")
    child.join(parent.select(col(pkCol).as("__qk")),
        col(fkCol) === col("__qk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))
  }
}
