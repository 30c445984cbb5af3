package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force top-k: ranks are 1..k, best neighbor first, no self") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
      .collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.map(_.getAs[Double]("sim")).toSeq.reverse.sorted.reverse ==
        sorted.map(_.getAs[Double]("sim")).toSeq, "sims non-increasing")
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q), "self excluded")
    }
  }

  test("LSH near-dup join finds planted identical vectors") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
    // plant: vec 1000 = copy of vec 0
    val copy = base.filter(col("vec_id") === 0)
      .select(lit(1000L).as("vec_id"), col("embedding"), col("label"))
    val vecs = base.unionByName(copy)
    val pairs = Similarity.lshNearDupPairs(vecs, maxL2 = 0.01)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1000L)), s"identical vector pair found: $pairs")
  }

  test("sign-LSH recall ≥0.9 on planted near-dups, few random survivors") {
    val base = Tables.embeddings(spark, sf).filter(col("vec_id") < 100)
    // jittered copy of each vector (cos ≈ 0.99) under vec_id + 10000
    val jittered = base.select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + lit(0.02f) * sin(col("vec_id") * 7 + i)).cast("float")).as("embedding"),
      col("label"))
    val vecs = base.unionByName(jittered)
    val exact = Similarity.cosinePairs(vecs, minCosine = 0.98)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exact.size >= 90, s"planted pairs exist: ${exact.size}")
    val approx = Similarity.signLshNearDupPairs(vecs, minCosine = 0.98)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"sign-LSH recall $recall over ${exact.size} planted pairs")
    assert(approx.subsetOf(exact), "verification step admits no false positives")
  }

  test("IVF top-k: high recall vs brute force at nProbe=4/16 cells") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.ivfTopK(queries, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall (probing 4/16 cells)")
    // determinism: same seed → same result
    val again = Similarity.ivfTopK(queries, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(approx == again)
  }

  test("KNN classify predicts the planted label for a cloned cluster") {
    import spark.implicits._
    // train: 10 copies of vec 0 with label 7; queries: vec 0 itself
    val emb = Tables.embeddings(spark, sf)
    val v0 = emb.filter(col("vec_id") === 0)
    val train = (1 to 10).map(i => v0.select(lit(i.toLong * 100).as("vec_id"),
        col("embedding"), lit(7).as("label"))).reduce(_ unionByName _)
      .unionByName(emb.filter(col("vec_id").between(1, 20))
        .select(col("vec_id"), col("embedding"), lit(1).as("label")))
    val out = Knn.classify(v0, train, k = 5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("pred_label") == 7)
    assert(out.head.getAs[Long]("n_votes") == 5L)
  }
}
