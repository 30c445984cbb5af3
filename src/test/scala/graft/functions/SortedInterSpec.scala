package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SortedInterExpr merge-walk kernel against the built-in
  * `array_intersect` (set semantics) on random sorted-distinct inputs —
  * the producer-owns-the-sort contract q185 relies on. */
class SortedInterSpec extends SparkSpec {
  import spark.implicits._

  test("kernel count equals size(array_intersect) on random sorted-distinct arrays") {
    val rnd = new scala.util.Random(7)
    def arr(): Seq[String] =
      (0 until rnd.nextInt(40)).map(_ => s"g${rnd.nextInt(60)}").distinct.sorted
    val rows = (1 to 200).map(_ => (arr(), arr()))
    val df = rows.toDF("a", "b")
      .withColumn("kernel", SortedInterExpr.interCount(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("kernel") =!= col("builtin")).count()
    assert(bad == 0, s"$bad rows diverge from array_intersect")
    // edges: empty sides, full overlap, disjoint
    val edges = Seq(
      (Seq.empty[String], Seq("a", "b"), 0L),
      (Seq("a", "b"), Seq.empty[String], 0L),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),
      (Seq("a", "b"), Seq("c", "d"), 0L))
    edges.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(SortedInterExpr.interCount(col("a"), col("b"))).head.getLong(0)
      assert(got == want, s"$a ∩ $b")
    }
    // null array → null result
    val n = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
      .select(SortedInterExpr.interCount(col("a"), col("b"))).head
    assert(n.isNullAt(0))
  }

  test("long-element form equals array_intersect, including negatives") {
    val rnd = new scala.util.Random(11)
    def arr(): Seq[Long] =
      (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong - 30).distinct.sorted
    val rows = (1 to 200).map(_ => (arr(), arr()))
    val df = rows.toDF("a", "b")
      .withColumn("kernel", SortedInterExpr.interCount(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("kernel") =!= col("builtin")).count()
    assert(bad == 0, s"$bad long rows diverge from array_intersect")
    val edge = Seq((Seq(Long.MinValue, -1L, 7L), Seq(-1L, 7L, Long.MaxValue)))
      .toDF("a", "b")
      .select(SortedInterExpr.interCount(col("a"), col("b"))).head.getLong(0)
    assert(edge == 2L, "signed numeric order, not unsigned")
  }
}
