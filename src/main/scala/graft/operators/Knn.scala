package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KNN classifier built relationally (SURVEY.md §2.10 M4 / §2.8 J1-J3 — the
  * reference's `KNeighborsClassifier(n_neighbors=5)`, src/main.py:106-109,
  * re-expressed as: broadcast similarity join → per-query top-k window →
  * majority-vote argmax).
  *
  * The train side rides the same broadcast/top-k machinery as Similarity;
  * prediction is two hash aggregations. Nothing touches the driver.
  */
object Knn {

  /** Predict a label per query row by majority vote of the k nearest
    * (cosine) train rows. Vote ties break toward the smaller label —
    * deterministic and oracle-expressible. */
  def classify(queries: DataFrame, train: DataFrame, k: Int): DataFrame = {
    val neighbors = Similarity.bruteForceTopK(
      queries.select("vec_id", "embedding"),
      train.select("vec_id", "embedding"), k, excludeSelf = false)
    // neighbors is k·|queries| rows — usually the small side, but |queries|
    // is caller-controlled and unbounded (scoring a whole corpus is legal),
    // so no forced broadcast: AQE sees the post-top-k size at runtime and
    // picks BHJ exactly when it actually fits.
    val labeled = neighbors.join(
      train.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
    val votes = labeled.groupBy("query_id", "label").agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("query_id").orderBy(col("n_votes").desc, col("label"))
    votes.withColumn("vote_rank", row_number().over(w))
      .filter(col("vote_rank") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("n_votes"))
  }
}
