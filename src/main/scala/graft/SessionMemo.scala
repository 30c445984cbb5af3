package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Session-keyed memoization with stopped-session eviction.
  *
  * The fit-once/serve-many caches (Graph.tradePairs / coSupplyEdges,
  * PipelineQueries.quantizedVecsCk / lloydCentroidsCached) key on
  * (SparkSession, dir, …) so each session materializes its expensive shared
  * state once. A bare ConcurrentHashMap, however, never forgets: entries for
  * STOPPED sessions keep DataFrame/checkpointed-RDD references alive for the
  * life of the JVM (ADVICE r18) — a long-lived process or a many-session test
  * run accumulates stale plans. `cached` sweeps dead-session keys on every
  * access before computing: the sweep is O(live sessions) over a map whose
  * size is bounded by sessions × dirs (a handful), so the cost is noise next
  * to the builds being memoized.
  */
object SessionMemo {

  /** computeIfAbsent with a prior sweep of entries whose session stopped.
    * `sessionOf` extracts the owning session from a cache key. */
  def cached[K, V](cache: ConcurrentHashMap[K, V], key: K)
                  (sessionOf: K => SparkSession)(build: K => V): V = {
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (sessionOf(k).sparkContext.isStopped) it.remove()
    }
    cache.computeIfAbsent(key, k => build(k))
  }
}
