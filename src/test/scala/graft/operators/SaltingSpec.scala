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

  test("salted join equals plain join on skewed keys, spreads the hot key") {
    import spark.implicits._
    // 90% of fact rows share one key; dimension is unique per key
    val fact = (1L to 10000L)
      .map(i => (i, if (i % 10 == 0) s"key${i % 7}" else "hot", (i % 100).toDouble))
      .toDF("id", "k", "v")
    val dim = fact.groupBy("k").agg(count(lit(1)).as("k_total"))
    val salted = Salting.saltedJoin(fact, dim, "k", col("id"), buckets = 8)
      .orderBy("id").collect().map(_.toSeq.toVector).toVector
    val plainRows = fact.join(dim, "k")
      .select("k", "id", "v", "k_total")
      .orderBy("id").collect().map(_.toSeq.toVector).toVector
    assert(salted === plainRows, "salted join must be row-identical to the plain join")
    // the hot key's fact rows really fan out: every salt bucket is hit
    val saltsHit = fact.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("id")), lit(8)).cast("int")).distinct().count()
    assert(saltsHit == 8, s"hot key should spread over all 8 buckets, hit $saltsHit")
  }

  test("salted aggregation is layout-independent (q74's oracle contract)") {
    // The salt is a function of the PHYSICAL layout (partition id + row
    // position), so different partitionings produce different partial
    // groupings — but sum/count are decomposable over exact decimals, so
    // the combined RESULT must be bit-identical under any layout. This is
    // what lets q74 hash-match a plain GROUP BY oracle.
    val ev = Tables.events(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      Salting.saltedSumCount(df, Seq("event_type"), "value")
        .orderBy("event_type").collect().map(_.toSeq.toVector).toVector
    val base = run(ev)
    assert(base === run(ev.repartition(13)), "repartition must not change the result")
    assert(base === run(ev.repartition(1)), "single partition must not change the result")
  }
}
