package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def summary(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts) // force partial buffers + merge + serde
      .agg(FrequentItemsSketch.frequentItems(col("item"), k).as("s"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when distinct items fit in k (the q53 regime)") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    (1 to 4).foreach { parts =>
      val m = summary(scala.util.Random.shuffle(items), k = 8, parts = parts)
      assert(m == Map("a" -> 50L, "b" -> 30L, "c" -> 7L),
        s"under-capacity sketch must be exact and partition-independent (parts=$parts)")
    }
  }

  test("superset guarantee: every item with count > n/(k+1) survives an adversarial stream") {
    // 2 genuinely heavy items drowned in 400 distinct singletons, k far
    // below the distinct count so decrements fire constantly.
    val heavy = Seq.fill(120)("HOT1") ++ Seq.fill(90)("HOT2")
    val noise = (1 to 400).map(i => s"noise$i")
    val items = scala.util.Random.shuffle(heavy ++ noise)
    val n = items.size
    val k = 16
    val m = summary(items, k, parts = 8)
    assert(m.size <= k, "state bound")
    val mustSurvive = Seq("HOT1" -> 120L, "HOT2" -> 90L).filter(_._2 > n / (k + 1))
    assert(mustSurvive.nonEmpty, "test must actually exercise the bound")
    mustSurvive.foreach { case (item, true_count) =>
      assert(m.contains(item), s"$item (count $true_count > n/(k+1)=${n / (k + 1)}) missing")
      assert(m(item) <= true_count, "estimates are lower bounds")
      assert(m(item) >= true_count - n / (k + 1).toLong, "error bound n/(k+1)")
    }
  }

  test("output ordered estimate desc then item asc") {
    val rows = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(9)("z")
    val out = rows.toDF("item")
      .agg(FrequentItemsSketch.frequentItems(col("item"), 8).as("s"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out == Seq(("z", 9L), ("a", 5L), ("b", 5L)))
  }
}
