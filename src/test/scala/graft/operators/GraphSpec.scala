package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: the same integer micro-unit recurrence, naively. */
  private def refPageRank(edges: Seq[((String, Long), (String, Long))],
                          iterations: Int): Map[(String, Long), Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = out.view.mapValues(_.size.toLong).toMap
    var ranks: Map[(String, Long), Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to iterations) {
      val contribs = edges.map { case (s, d) => d -> (ranks(s) * 85) / (100 * deg(s)) }
      ranks = contribs.groupBy(_._1).map { case (n, cs) => n -> (150000L + cs.map(_._2).sum) }
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
}
