package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("balancedSample returns exactly n per class, deterministically") {
    val orders = Tables.orders(spark, sf)
    val s1 = Sampling.balancedSample(orders, "o_orderstatus", 50, seed = 15)
    val counts = s1.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet == Set(50L), s"got $counts")
    val s2 = Sampling.balancedSample(orders, "o_orderstatus", 50, seed = 15)
    assert(s1.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("balancedSample is layout-independent (same sample after repartition)") {
    val orders = Tables.orders(spark, sf)
    val base = Sampling.balancedSample(orders, "o_orderstatus", 50, seed = 15)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val shuffled = Sampling.balancedSample(orders.repartition(13), "o_orderstatus", 50, seed = 15)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(base === shuffled, "content-hash ordering must not depend on input partitioning")
    // a different seed draws a different sample
    val other = Sampling.balancedSample(orders, "o_orderstatus", 50, seed = 16)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(base !== other)
  }

  test("balancedSample is column-order-independent and skips map columns") {
    val orders = Tables.orders(spark, sf)
    val base = Sampling.balancedSample(orders, "o_orderstatus", 50, seed = 15)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    // same columns in a different physical order → same draw (keys are name-sorted)
    val reordered = Sampling.balancedSample(
      orders.select(orders.columns.reverse.toIndexedSeq.map(col): _*), "o_orderstatus", 50, seed = 15)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(base === reordered, "draw must not depend on column order")
    // a map column would fail xxhash64 analysis; the default key set skips it
    val withMap = orders.withColumn("m", map(lit("k"), col("o_orderkey")))
    val mapped = Sampling.balancedSample(withMap, "o_orderstatus", 50, seed = 15)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(base === mapped, "unhashable columns must be excluded from the draw key")
    // an explicit key subset pins the draw regardless of added columns
    val keyed1 = Sampling.balancedSample(
      orders.withColumn("extra", lit(1)), "o_orderstatus", 50, seed = 15,
      keyCols = Seq("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val keyed2 = Sampling.balancedSample(
      orders.withColumn("other", lit("x")), "o_orderstatus", 50, seed = 15,
      keyCols = Seq("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(keyed1 === keyed2, "explicit keyCols must pin the draw across schema changes")
  }

  test("deterministicSample ranks 1..n within each class") {
    val s = Sampling.deterministicSample(
      Tables.orders(spark, sf), Seq("o_orderstatus"), col("o_orderkey").cast("string"), 10)
    val perClass = s.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), min("sample_rank").as("lo"), max("sample_rank").as("hi"))
      .collect()
    perClass.foreach { r =>
      assert(r.getAs[Long]("n") == 10 && r.getAs[Int]("lo") == 1 && r.getAs[Int]("hi") == 10)
    }
  }

  test("bounded-heap sampler is row- and rank-identical to the window form") {
    // the selection contract: same rows, same ranks as
    // row_number() OVER (PARTITION BY class ORDER BY md5(key), key)
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf)
    val key = col("o_orderkey").cast("string")
    val w = Window.partitionBy("o_orderstatus").orderBy(md5(key), key)
    val windowed = orders
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 100)
      .select("o_orderstatus", "o_orderkey", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val heaped = Sampling.deterministicSample(orders, Seq("o_orderstatus"), key, 100)
      .select("o_orderstatus", "o_orderkey", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(heaped === windowed)
  }

  test("sampler plan has no window and no per-class sort (scale shape)") {
    // the point of the bounded heap: NOTHING in the plan sorts a class
    // through one task — no Window operator, no Sort at all (the aggregate
    // is hash-based), and parallelism is never bounded by class cardinality
    val plan = Sampling.deterministicSample(
      Tables.orders(spark, sf), Seq("o_orderstatus"), col("o_orderkey").cast("string"), 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sampler must not plan a window:\n$plan")
    assert(!plan.contains("Sort"), s"sampler must not plan any sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected bounded-heap aggregate:\n$plan")
  }

  test("trainValidSplit partitions the data") {
    val docs = Tables.documents(spark, sf)
    val (train, valid) = Sampling.trainValidSplit(docs, 0.8, seed = 15)
    assert(train.count() + valid.count() == docs.count())
    assert(train.join(valid, "doc_id").count() == 0)
  }

  test("ppsSystematic: pin count is exact and selection is layout-independent") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").as("w"))
    val out = Sampling.ppsSystematic(docs, "doc_id", "w", targetN = 50L)
    val total = docs.agg(sum(col("w"))).head.getLong(0)
    val step = math.max(total / 50L, 1L)
    // systematic pins land at step, 2*step, ..., so the hit MASS is exactly
    // the number of multiples of step inside (0, total]
    assert(out.agg(sum(col("n_hits"))).head.getLong(0) === total / step)
    // determinism must come from values, not layout
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids7 = Sampling.ppsSystematic(docs.repartition(7), "doc_id", "w", 50L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === ids7)
  }

  test("weightedReservoir: deterministic, layout-independent, weight-biased inclusion") {
    import spark.implicits._
    // 6 heavy (w=9) + 24 light (w=1) items, k=8 slots: heavy items carry
    // 54/78 of the total weight, so across independent salts their
    // inclusion RATE must dominate the light items' — the
    // inclusion-probability property that makes A-ES a weighted sampler
    // rather than a uniform one wearing weights
    val items = ((0 until 6).map(i => (i.toLong, 9L)) ++
      (6 until 30).map(i => (i.toLong, 1L))).toDF("id", "w")
    val base = Sampling.weightedReservoir(items, "id", "w", k = 8, salt = "s0")
    val basePicks = base.select("id").as[Long].collect().sorted.toSeq
    assert(basePicks.size == 8)
    // determinism + layout independence (content-hash keys, bounded heap)
    val again = Sampling.weightedReservoir(items.repartition(7), "id", "w", k = 8, salt = "s0")
      .select("id").as[Long].collect().sorted.toSeq
    assert(basePicks === again)
    // ranks are 1..k and keys nonnegative
    val ranked = base.select("sample_rank", "e_key").collect()
    assert(ranked.map(_.getAs[Int]("sample_rank")).sorted.toSeq == (1 to 8))
    assert(ranked.forall(_.getAs[Long]("e_key") >= 0))
    // inclusion-probability bound over 24 independent salts
    val salts = (0 until 24).map(i => s"salt$i")
    val counts = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    salts.foreach { s =>
      Sampling.weightedReservoir(items, "id", "w", k = 8, salt = s)
        .select("id").as[Long].collect().foreach(id => counts(id) += 1)
    }
    val heavyRate = (0 until 6).map(i => counts(i.toLong)).sum / (6.0 * salts.size)
    val lightRate = (6 until 30).map(i => counts(i.toLong)).sum / (24.0 * salts.size)
    assert(heavyRate > 2 * lightRate,
      s"heavy items must be included far more often: heavy=$heavyRate light=$lightRate")
    assert(heavyRate > 0.5, s"a 9x-weight item with 8 slots over 30 items: $heavyRate")
  }

  test("weightedReservoir: negative id fails loudly (the validated contract)") {
    import spark.implicits._
    // ADVICE r20: the scaladoc promised "(validated)" — a negative id
    // hex-encodes as two's complement and would silently sort after every
    // positive id. The guard must RAISE, not mis-order.
    val items = Seq((-1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedReservoir(items, "id", "w", k = 2, salt = "s0").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("nonnegative-id contract")),
      s"expected the contract violation to surface, got: $e")
  }
}
