package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact (A5)") {
    val o = Tables.orders(spark, sf)
    val row = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx")).collect().head
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("filter and projection are pushed into the parquet scan") {
    val plan = Relational.q02ScanProjectFilter.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(l_quantity,45"), s"pushdown missing:\n$plan")
    assert(!plan.contains("l_partkey"), "unused columns pruned from ReadSchema")
  }

  test("dimension joins broadcast; fact-fact join shuffles") {
    val star = Relational.q03JoinBroadcast.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(star.contains("BroadcastHashJoin"), s"star join should broadcast dims:\n$star")
    val ff = Relational.q04JoinSortMerge.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ff.contains("SortMergeJoin") || ff.contains("ShuffledHashJoin") ||
      ff.contains("BroadcastHashJoin"), // AQE may broadcast at tiny SF
      s"fact join plan unexpected:\n$ff")
  }

  test("q46 six-table join: dims broadcast, date filter pushed, no product") {
    val plan = Relational.q46RegionalRevenue.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"nation/region must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"theta condition must fold into the supplier equi-join:\n$plan")
    assert(plan.contains("o_orderdate") && plan.contains("PushedFilters:"),
      s"date filter must reach the orders scan:\n$plan")
  }

  test("no forced broadcast of unbounded relations (q27 vocabulary, knn neighbors)") {
    // q27: the document-frequency table is the corpus vocabulary — only the
    // 1-row n_docs scalar may carry a broadcast hint
    val q27 = TextQueries.q27TokenRarity.build(spark, sf).queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(q27).length == 1,
      s"q27 must not force-broadcast the vocabulary table:\n$q27")
    // knn: the neighbors relation is k·|queries| with unbounded |queries| —
    // only bruteForceTopK's documented bounded query side may carry a hint
    val emb = Tables.embeddings(spark, sf)
    val knn = Knn.classify(emb.filter(col("vec_id") % 25 === 0), emb, k = 5)
      .queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(knn).length == 1,
      s"knn must not force-broadcast the neighbors relation:\n$knn")
  }

  test("positional zip: ordered index and zipWithIndex agree on sorted input") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val ordered = Positional.withRowIndexOrdered(docs, Seq("doc_id"))
    val rows = ordered.orderBy("row_idx").collect()
    assert(rows.head.getAs[Long]("row_idx") == 0L)
    assert(rows.length == docs.count())
    // index follows doc_id order
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.sorted.sameElements(ids))
    val zipped = Positional.zipByPosition(
      docs, Seq("doc_id"),
      Tables.documents(spark, sf).select(col("doc_id").as("d2"), col("source")), Seq("d2"))
    assert(zipped.filter(col("doc_id") =!= col("d2")).count() == 0,
      "same order => rows align positionally")
  }
}
