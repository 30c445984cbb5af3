package graft.operators

import graft.SparkSpec

/** Property pins for the mixture/LM pipeline queries whose full semantics
  * live in the DuckDB oracle gate: these assert the invariants the oracle
  * can't phrase (determinism across runs, probability structure).
  */
class PipelineQueriesSpec extends SparkSpec {

  test("q56: deterministic sample, rates in (0, 1], rate shrinks with source size") {
    val a = PipelineQueries.q56MixtureResample.build(spark, sf).collect()
    val b = PipelineQueries.q56MixtureResample.build(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq, "same sample every run")
    assert(a.nonEmpty)
    val rates = a.map(r => r.getAs[String]("source") -> r.getAs[Double]("keep_rate")).toMap
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    // the anchor source (largest token total) must have the SMALLEST rate
    // (1/2 by construction unless every source ties)
    assert(rates.values.min >= 0.5, "anchored flattening never drops below α=1/2 of the max source")
  }

  test("q57: conditional probabilities are exact count ratios with coherent prefixes") {
    val rows = PipelineQueries.q57BigramLm.build(spark, sf).collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      val (nAb, nA, p) =
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Double]("p_cond"))
      assert(nAb >= 1 && nA >= nAb, s"prefix total covers the pair: $r")
      assert(p === nAb.toDouble / nA.toDouble, s"exact IEEE ratio: $r")
    }
    // within any prefix, listed pairs can't exceed the prefix mass
    rows.groupBy(_.getAs[String]("a")).foreach { case (a, g) =>
      val nA = g.head.getAs[Long]("n_a")
      assert(g.map(_.getAs[Long]("n_ab")).sum <= nA, s"prefix '$a' mass exceeded")
    }
    // top-30 ordering is by raw pair count, descending
    val counts = rows.map(_.getAs[Long]("n_ab")).toSeq
    assert(counts === counts.sorted.reverse)
  }
}
