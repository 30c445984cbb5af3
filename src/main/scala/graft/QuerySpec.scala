package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator surface: a Spark DataFrame builder plus, when the
  * semantics are ANSI-SQL-expressible, the equivalent DuckDB SQL for the
  * driver's differential oracle (see Verify.scala).
  *
  * Contract gotchas the specs must respect:
  *   - column names must match between the DataFrame and the SQL (the driver
  *     sorts columns by name before hashing values);
  *   - results must be deterministic: seeded/keyed ordering before any limit,
  *     exact (decimal) aggregation of doubles, UTC timestamps.
  */
final case class QuerySpec(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QuerySpec {
  def oracle(name: String, sql: String)(build: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, build, Some(sql))

  /** Rows-only check: no SQL-expressible oracle (hash-seeded ops, MLlib, …). */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, build, None)
}
