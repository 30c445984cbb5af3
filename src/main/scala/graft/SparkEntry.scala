package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-module registries; each module covers one
  * band of SURVEY.md §2's operator inventory.
  */
object SparkEntry {

  /** Every verifiable operator surface, in SURVEY §2 order. */
  def specs: Seq[QuerySpec] =
    operators.Relational.all ++ operators.TextQueries.all ++
      operators.PipelineQueries.all ++ ml.MlQueries.all ++
      operators.EventQueries.all ++ multimodal.MultimodalQueries.all ++
      operators.Graph.all ++ operators.Bpe.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (insertion-ordered
    * so bench runs are comparable across rounds). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(specs.map(s => s.name -> s.build): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
