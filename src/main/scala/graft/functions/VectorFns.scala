package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column combinators over `array<float>` embeddings
  * (SURVEY.md §2.8 J1; north-star similarity search).
  *
  * All folds are sequential left-to-right over the array and cast each
  * element to double BEFORE multiplying — this makes the result bit-identical
  * to DuckDB's `list_reduce(list_prepend(0.0, list_transform(...)))` fold, so
  * cosine rankings hash-match across engines. Everything stays inside
  * whole-stage codegen (no UDFs): at 100 TB the dot product is the inner loop
  * of a scan, not a serialization boundary.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ as an exact left fold in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (same fold shape). */
  def normSq(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance (KNN's metric, reference src/main.py:106-109). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** DuckDB rendering of the same folds (for oracle SQL). */
  object Sql {
    private def fold(listExpr: String): String =
      s"list_reduce(list_prepend(0.0, $listExpr), (acc, v) -> acc + v)"

    def dot(a: String, b: String): String =
      fold(s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))")

    def normSq(a: String): String =
      fold(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")

    def cosine(a: String, b: String): String =
      s"${dot(a, b)} / (sqrt(${normSq(a)}) * sqrt(${normSq(b)}))"
  }
}
