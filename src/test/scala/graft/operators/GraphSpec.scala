package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: the same integer micro-unit recurrence, naively —
    * including the dangling-mass term over the full src ∪ dst node set. */
  private def refPageRank(edges: Seq[((String, Long), (String, Long))],
                          iterations: Int): Map[(String, Long), Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toLong
    var ranks: Map[(String, Long), Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val dm = nodes.filterNot(deg.contains).map(ranks).sum
      val share = (dm * 85) / (100 * n)
      val contribs = edges.map { case (s, d) => d -> (ranks(s) * 85) / (100 * deg(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ranks = nodes.map(v => v -> (150000L + share + contribs.getOrElse(v, 0L))).toMap
    }
    ranks
  }

  private def toEdgeDf(edges: Seq[((String, Long), (String, Long))]) =
    edges.map { case ((st, s), (dt, d)) => (st, s, dt, d) }
      .toDF("src_t", "src", "dst_t", "dst")

  test("pageRank matches the naive integer recurrence on a hand-checkable star") {
    // undirected star a—{b,c,d}: hub deg 3, leaves deg 1
    val und = Seq((("c", 1L), ("s", 10L)), (("c", 1L), ("s", 11L)), (("c", 1L), ("s", 12L)))
    val edges = und ++ und.map(_.swap)
    val got = Graph.pageRank(toEdgeDf(edges), iterations = 2)
      .as[(String, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    // round 1: hub 150000 + 3·850000; leaf 150000 + (85·10^6 div 300)
    // round 2: hub 150000 + 3·((433333·85) div 100); leaf 150000 + (2700000·85) div 300
    assert(got((("c"), 1L)) === 1254999L)
    assert(got((("s"), 10L)) === 915000L)
    assert(got === refPageRank(edges, 2))
  }

  test("pageRank matches the naive recurrence on a seeded random bipartite graph") {
    val rnd = new scala.util.Random(7)
    val und = (for (_ <- 1 to 60) yield (("c", rnd.nextInt(12).toLong), ("s", rnd.nextInt(8).toLong + 100))).distinct
    val edges = und ++ und.map(_.swap)
    val got = Graph.pageRank(toEdgeDf(edges), iterations = 5)
      .as[(String, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    val want = refPageRank(edges, 5)
    assert(got === want)
    // mass conservation bound: truncation only ever LOSES units, so the
    // total never exceeds |V| · unit, and each rank keeps the teleport floor
    assert(got.values.sum <= und.flatMap(e => Seq(e._1, e._2)).distinct.size * 1000000L)
    assert(got.values.forall(_ >= 150000L))
  }

  test("directed graph with sinks conserves mass via dangling redistribution") {
    // chain a -> b -> c plus d -> c: c is a SINK holding growing mass, d has
    // no in-edges. Without the dangling term c's mass vanishes each round
    // and the total decays toward |V|·teleport.
    val edges = Seq(
      (("n", 1L), ("n", 2L)), (("n", 2L), ("n", 3L)), (("n", 4L), ("n", 3L)))
    val it = 5
    val got = Graph.pageRank(toEdgeDf(edges), iterations = it)
      .as[(String, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    assert(got.size === 4, "dst-only and src-only nodes all present")
    assert(got === refPageRank(edges, it), "exact match incl. the dangling term")
    // mass conservation up to integral-division truncation: each iteration
    // loses < 1 unit per edge contribution + 1 on the share division, so
    // the band is tight — the LEAK the term repairs would be ~10^5 units/round
    val total = got.values.sum
    val n = 4L
    assert(total <= n * 1000000L)
    assert(total >= n * 1000000L - it * (edges.size + 1).toLong * n,
      s"total $total decayed — dangling mass is leaking, not redistributing")
  }

  /** Plain-Scala personalized-PageRank reference (same integer recurrence). */
  private def refPpr(edges: Seq[((String, Long), (String, Long))],
                     seeds: Set[(String, Long)], iterations: Int): Map[(String, Long), Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toLong
    val inS = seeds.intersect(nodes.toSet)
    val k = inS.size.toLong
    var ranks: Map[(String, Long), Long] =
      nodes.map(v => v -> (if (inS(v)) n * 1000000L / k else 0L)).toMap
    for (_ <- 1 to iterations) {
      val dm = nodes.filterNot(deg.contains).map(ranks).sum
      val seedTerm = (15L * n * 1000000L + 85L * dm) / (100L * k)
      val contribs = edges.map { case (s, d) => d -> (ranks(s) * 85) / (100 * deg(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ranks = nodes.map(v =>
        v -> ((if (inS(v)) seedTerm else 0L) + contribs.getOrElse(v, 0L))).toMap
    }
    ranks
  }

  /** Plain-Scala reference for [[Graph.hits]]: the same alternating
    * integer recurrence with per-node truncating L∞ normalization. */
  private def refHits(edges: Seq[(Long, Long)], rounds: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    var h: Map[Long, Long] = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val ar = edges.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      val am = ar.values.max
      a = ar.view.mapValues(v => v * 1000000L / am).toMap
      val hr = edges.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      val hm = hr.values.max
      h = hr.view.mapValues(v => v * 1000000L / hm).toMap
    }
    (h, a)
  }

  test("hits matches a plain-Scala recurrence; mutual reinforcement ranks the shared supplier") {
    // customer 3 buys from BOTH suppliers; supplier 10 serves everyone —
    // the hub and the authority the recurrence must surface
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L))
    val df = edges.toDF("cust", "supp")
    val (h, a) = Graph.hits(df, rounds = 4)
    val hubGot = h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val authGot = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (hubRef, authRef) = refHits(edges, 4)
    assert(hubGot == hubRef, s"hubs diverge: $hubGot vs $hubRef")
    assert(authGot == authRef, s"authorities diverge: $authGot vs $authRef")
    // L-infinity normalization: exactly one max at unit per side
    assert(hubGot.values.max == 1000000L && authGot.values.max == 1000000L)
    assert(hubGot(3L) == 1000000L, "the two-supplier customer is the top hub")
    assert(authGot(10L) == 1000000L && authGot(20L) < 1000000L,
      "the everyone's supplier is the top authority")
    // a random bipartite graph agrees too (seeded)
    val rnd = new scala.util.Random(7)
    val rndEdges = (for (_ <- 1 to 60)
      yield (rnd.nextInt(8).toLong, 100L + rnd.nextInt(5))).distinct
    val (h2, a2) = Graph.hits(rndEdges.toDF("cust", "supp"), rounds = 3)
    val (hr2, ar2) = refHits(rndEdges, 3)
    assert(h2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == hr2)
    assert(a2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == ar2)
  }

  test("personalized PageRank concentrates mass near the seed set, matches the reference") {
    // path graph 1 - 2 - 3 - 4 (undirected), seed = node 1: proximity must
    // decay with hop distance; an out-of-graph seed (99) must be ignored
    val und = Seq((("n", 1L), ("n", 2L)), (("n", 2L), ("n", 3L)), (("n", 3L), ("n", 4L)))
    val edges = und ++ und.map(_.swap)
    val seeds = Seq(("n", 1L), ("n", 99L)).toDF("src_t", "src")
    val got = Graph.personalizedPageRank(toEdgeDf(edges), seeds, iterations = 3)
      .as[(String, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    assert(got === refPpr(edges, Set(("n", 1L)), 3))
    // a path graph is bipartite, so un-lazified power iteration OSCILLATES
    // between the parity classes ({1,3} vs {2,4}); proximity ordering is
    // only monotone WITHIN a parity class: seed > 2-hop, 1-hop > 3-hop.
    // Everything reachable within 3 hops holds positive mass.
    assert(got(("n", 1L)) > got(("n", 3L)))
    assert(got(("n", 2L)) > got(("n", 4L)))
    assert(got.values.forall(_ > 0L))
  }

  test("entity resolution merges transitive fuzzy chains to one canonical name") {
    val q = graft.SparkEntry.queries("q140_entity_groups")(spark, sf)
    val rows = q.as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // canonical is a member of its own entity and alphabetically minimal
    val byEntity = rows.groupBy(_._2)
    byEntity.foreach { case (entity, members) =>
      assert(members.map(_._1).contains(entity))
      assert(members.map(_._1).min === entity)
      assert(members.forall(_._3 === members.length.toLong))
    }
    // every distinct part name appears exactly once
    val nNames = graft.sources.Tables.part(spark, sf)
      .select(countDistinct(col("p_name"))).as[Long].head()
    assert(rows.length.toLong === nNames)
  }

  test("labelPropagation separates a barbell and matches a plain-Scala reference") {
    // two triangles joined by one bridge edge: after 3 synchronous rounds
    // each triangle settles on its own label (the bridge minority vote
    // never outweighs the two in-triangle neighbors; hand-traced, the
    // right triangle needs the third round to absorb its tie cascade)
    val barbell = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("s_a", "s_b")
    val got = Graph.labelPropagation(barbell, 3).as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L), s"bridge merged the barbell: $got")

    // seeded random graph vs a plain-Scala synchronous LPA
    val rnd = new scala.util.Random(7)
    val edges = (for (_ <- 1 to 80)
      yield (rnd.nextInt(16).toLong, rnd.nextInt(16).toLong))
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val nbrs = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var ref = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      ref = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(ref).view.mapValues(_.size).toMap
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got2 = Graph.labelPropagation(edges.toDF("s_a", "s_b"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got2 === ref)
  }

  test("triangleStats matches a plain-Scala census on known and random graphs") {
    // K4 minus edge (3,4): triangles (1,2,3) and (1,2,4)
    val k4m = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("s_a", "s_b")
    val got = Graph.triangleStats(k4m).as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 2L, 4.0 / 6.0))) // deg 3, 2 triangles, lcc 2·2/(3·2)
    assert(got(2L) === ((3L, 2L, 4.0 / 6.0)))
    assert(got(3L) === ((2L, 1L, 1.0)))
    assert(got(4L) === ((2L, 1L, 1.0)))
    // seeded random graph vs a plain-Scala neighborhood census
    val rnd = new scala.util.Random(11)
    val edges = (for (_ <- 1 to 120)
      yield (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val refCensus = nodes.map { v =>
      val nbrs = nodes.filter(u => u != v && es((math.min(u, v), math.max(u, v))))
      v -> (nbrs.size.toLong,
        nbrs.combinations(2).count(p => es((p(0), p(1)))).toLong)
    }.toMap
    val got2 = Graph.triangleStats(edges.toDF("s_a", "s_b"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got2 === refCensus)
  }

  test("hopDistance walks a path graph by exactly one layer per round") {
    // path 1—2—3—4—5; the hand-traceable BFS fixture
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s_a", "s_b")
    def hops(seeds: Seq[Long], rounds: Int): Map[Long, Long] =
      Graph.hopDistance(path, seeds.toDF("node"), rounds)
        .as[(Long, Long)].collect().toMap
    // enough rounds: full distances from the end seed
    assert(hops(Seq(1L), 4) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // the round count IS the horizon: nodes beyond it report -1
    assert(hops(Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L, 5L -> -1L))
    // multi-seed takes the MIN over seeds; a seed outside the graph is ignored
    assert(hops(Seq(1L, 5L, 99L), 2) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    // extra rounds past convergence are a fixpoint
    assert(hops(Seq(3L), 9) === Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("kCore peels a planted core and matches a plain-Scala peeler on a random graph") {
    // K4 on {1,2,3,4} plus pendant 5-1 and a 5-6 tail: 2-core = the K4
    // (pendants cascade off), 3-core = the K4, 4-core empty
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (5L, 6L))
    val df = k4.toDF("s_a", "s_b")
    val got = Graph.kCore(df, Seq(2, 3, 4), rounds = 6)
      .as[(Long, Long, Long)].collect().toSet
    val expect = (for (n <- 1L to 4L; k <- Seq(2L, 3L)) yield (k, n, 3L)).toSet
    assert(got === expect)

    // seeded random graph vs a plain-Scala fixpoint peeler
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    def peel(k: Int): Map[Long, Int] = {
      var alive = adj.keySet.toSet
      var changed = true
      while (changed) {
        val dead = alive.filter(v => adj(v).count(alive) < k)
        changed = dead.nonEmpty; alive = alive -- dead
      }
      alive.map(v => v -> adj(v).count(alive)).toMap
    }
    val ks = Seq(3, 5, 7)
    val got2 = Graph.kCore(edges.toDF("s_a", "s_b"), ks, rounds = 30)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(r => r._2 -> r._3).toMap }
    ks.foreach { k =>
      val want = peel(k).map { case (n, d) => n -> d.toLong }
      assert(got2.getOrElse(k.toLong, Map()) === want, s"k=$k")
    }
  }

  test("kTruss keeps K5 at k=5, sheds the pendant triangle, and matches a plain peeler") {
    // K5 on {1..5}: every edge has 3 common neighbors → survives k=5,
    // dies at k=6. Pendant triangle {6,7,8} bridged by 5-6: triangle
    // edges have 1 common neighbor → 3-truss only; the bridge sits in
    // no triangle at all and dies at every k ≥ 3.
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val extra = Seq((6L, 7L), (6L, 8L), (7L, 8L), (5L, 6L))
    val df = (k5 ++ extra).toDF("s_a", "s_b")
    val got = Graph.kTruss(df, Seq(3, 5, 6), rounds = 6)
      .as[(Long, Long, Long)].collect().toSet
    val expect =
      (for (n <- 1L to 5L) yield (3L, n, 4L)).toSet ++
        Set((3L, 6L, 2L), (3L, 7L, 2L), (3L, 8L, 2L)) ++
        (for (n <- 1L to 5L) yield (5L, n, 4L)).toSet
    assert(got === expect)

    // seeded random graph vs a plain-Scala synchronous truss peeler
    val rnd = new scala.util.Random(11)
    val edges = (1 to 160).map(_ => (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    def peel(k: Int): Map[Long, Long] = {
      var alive = edges.toSet
      var changed = true
      while (changed) {
        val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
        alive.foreach { case (a, b) => adj(a) += b; adj(b) += a }
        val dead = alive.filter { case (a, b) => (adj(a) & adj(b)).size < k - 2 }
        changed = dead.nonEmpty; alive = alive -- dead
      }
      alive.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    }
    val ks = Seq(4, 5, 6)
    val got2 = Graph.kTruss(edges.toDF("s_a", "s_b"), ks, rounds = 20)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(r => r._2 -> r._3).toMap }
    ks.foreach { k =>
      assert(got2.getOrElse(k.toLong, Map()) === peel(k), s"k=$k")
    }
  }

  test("minPlusDistance takes the cheaper multi-hop path over a heavy direct edge") {
    // triangle 1-2 (5), 2-3 (1), 1-3 (10): best 1→3 is 5+1=6, not 10
    val we = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L)).toDF("s_a", "s_b", "w")
    def dists(rounds: Int): Map[Long, Long] =
      Graph.minPlusDistance(we, Seq(1L).toDF("node"), rounds, inf = 999L)
        .as[(Long, Long)].collect().toMap
    // one round only relaxes direct edges; two rounds find the detour
    assert(dists(1) === Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
    assert(dists(2) === Map(1L -> 0L, 2L -> 5L, 3L -> 6L))
    assert(dists(7) === Map(1L -> 0L, 2L -> 5L, 3L -> 6L), "fixpoint")
  }
}
