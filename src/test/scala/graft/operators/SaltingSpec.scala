package graft.operators

import graft.SparkSpec
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on skewed keys") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val skewed = (1L to 10000L)
      .map(i => (if (i % 10 == 0) s"key${i % 7}" else "hot", (i % 100).toDouble))
      .toDF("k", "v")
    val salted = Salting.saltedSumCount(skewed, Seq("k"), "v", buckets = 8)
      .orderBy("k").collect()
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), dsum(col("v")).as("sum_v"))
      .orderBy("k").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getAs[String]("k") == d.getAs[String]("k"))
      assert(s.getAs[Long]("n_rows") == d.getAs[Long]("n_rows"))
      assert(s.getAs[Double]("sum_v") == d.getAs[Double]("sum_v"), "decimal partials → exact")
    }
  }
}
