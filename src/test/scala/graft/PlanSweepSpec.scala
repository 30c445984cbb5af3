package graft

/** Sweeping plan-quality guard over EVERY declared query: at 100 TB the one
  * plan shape that is never survivable is an unbounded nested-loop join, so
  * any query that plans a CartesianProduct / BroadcastNestedLoopJoin fails
  * here unless it is on the explicit allowlist of DOCUMENTED bounded uses.
  * Adding a query with an accidental non-equi join trips this immediately.
  */
class PlanSweepSpec extends SparkSpec {

  /** Plans that intentionally contain a bounded nested-loop side:
    * q34 — cosinePairs is a documented quadratic helper on a bounded subset;
    * q40/q42 — bruteForceTopK broadcasts the bounded query side into the
    * corpus cross join (the documented contract);
    * q43 — IVF probes ride the same broadcast-query machinery;
    * q27 — crossJoin(broadcast(nDocs)) where nDocs is a 1-row aggregate:
    * the lazy scalar-subquery idiom, bounded to exactly one row. */
  private val boundedNested = Set(
    "q34_embedding_pairs", "q40_knn_bruteforce", "q42_knn_classify", "q43_ann_ivf",
    "q27_token_rarity")

  /** Builders that EXECUTE heavyweight work eagerly (q50 trains and
    * evaluates four classifiers at build time): skipped here — a plan-string
    * check should not pay for a training run; their plans are exercised by
    * their own specs and the Verify gate. */
  private val eagerHeavy = Set("q50_ml_train_eval")

  test("no query plans an unbounded cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      if (boundedNested(name) || eagerHeavy(name)) None
      else {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    }
    assert(offenders.isEmpty,
      s"unbounded nested-loop plans in: ${offenders.mkString(", ")}")
  }
}
