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

  test("AQE splits the same skewed join at runtime — when to reach for which tool") {
    // Salting documents itself as the MANUAL complement to AQE's runtime
    // skew handling; this pins the division of labor. AQE's skew-join
    // rewrite covers exactly one shape: a sort-merge join whose built
    // shuffle blocks are already lopsided — it splits the fat partition
    // into parallel reads AT RUNTIME, no code change. Reach for it first.
    // saltedJoin covers what AQE cannot: bounding the per-reducer share
    // BEFORE the shuffle (a single reducer must never even receive the
    // hot key's rows — at 100 TB the fat block itself is the failure),
    // and aggregation skew (saltedSumCount), which AQE does not rebalance.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      // scale the skew thresholds to test data (defaults are 256 MB)
      conf.set(keys(0), "2")
      conf.set(keys(1), "262144")
      conf.set(keys(2), "131072")
      import org.apache.spark.sql.functions._
      // 90% of fact rows share key 0; ~100-byte payload gives the hot
      // shuffle partition real bytes for the size-based detector
      val fact = spark.range(0, 40000).select(
        col("id"),
        when(col("id") < 36000, lit(0L)).otherwise(pmod(col("id"), lit(64)) + 1).as("k"),
        rpad(col("id").cast("string"), 100, "x").as("payload"))
      val dim = spark.range(0, 65).select(col("id").as("k"), (col("id") * 10).as("attr"))
      val joined = fact.join(dim.hint("merge"), "k")
      val aqeRows = joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join rewrite did not fire on the planted skew:\n$finalPlan")
      // the salted rewrite of the SAME join: row-identical output, and its
      // plan needs no skew handling — the hot key was split pre-shuffle
      val salted = Salting.saltedJoin(fact, dim, "k", col("id"), buckets = 8)
      val saltedRows = salted.collect()
      assert(!salted.queryExecution.executedPlan.toString.contains("skew=true"),
        "salted join should present AQE with balanced partitions")
      def sorted(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"),
          r.getAs[String]("payload"), r.getAs[Long]("attr"))).sorted.toVector
      assert(sorted(saltedRows) === sorted(aqeRows),
        "both skew treatments must produce the identical row multiset")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
