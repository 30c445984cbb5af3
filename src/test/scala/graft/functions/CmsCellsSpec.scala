package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused CMS cell aggregate must emit EXACTLY the cells the explode +
  * groupBy expression form built (q198's r21 optimization) — same buckets,
  * same counts, same null handling — under multi-partition merges. */
class CmsCellsSpec extends SparkSpec {
  import spark.implicits._

  private val widths = Seq(256, 2048)
  private val d = 4

  private def hashed(df: org.apache.spark.sql.DataFrame, key: String) = {
    val md = md5(col(key).cast("string"))
    df.select(
      conv(substring(md, 1, 15), 16, 10).cast("long").as("h1"),
      conv(substring(md, 17, 15), 16, 10).cast("long").bitwiseOR(lit(1L)).as("h2"))
  }

  private def cellSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Option[Long], Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSet

  test("cmsCells equals the explode+groupBy form, including multi-partition merge") {
    val keys = (1L to 5000L).map(i => i % 997).toDF("k").repartition(8)
    val h = hashed(keys, "k")
    val viaAgg = h.agg(CmsCells.cmsCells(col("h1"), col("h2"), widths, d).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.w"), col("c.j"), col("c.bucket"), col("c.c"))
    val viaExplode = h
      .select(explode(array((for { w <- widths; j <- 0 until d } yield
        struct(lit(w.toLong).as("w"), lit(j).as("j"),
          pmod(col("h1") + lit(j.toLong) * col("h2"), lit(w.toLong)).as("bucket"))): _*)).as("wjb"))
      .groupBy(col("wjb.w").as("w"), col("wjb.j").as("j"), col("wjb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    assert(cellSet(viaAgg) == cellSet(viaExplode))
  }

  test("null hashes land in the (w, j, NULL) cells like the pmod form") {
    val rows = Seq[(java.lang.Long, java.lang.Long)]((3L, 5L), (null, 7L), (11L, null), (3L, 5L))
      .toDF("h1", "h2")
    val out = rows.agg(CmsCells.cmsCells(col("h1"), col("h2"), Seq(16), 2).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.w"), col("c.j"), col("c.bucket"), col("c.c"))
    val cells = cellSet(out)
    // two null-hash rows → count 2 in each (w, j, NULL) cell
    (0 until 2).foreach { j =>
      assert(cells.contains((16L, j, None, 2L)), s"missing null cell for j=$j")
    }
    // the two (3, 5) rows stack in their bucket: (3 + j*5) % 16
    (0 until 2).foreach { j =>
      assert(cells.contains((16L, j, Some((3L + j * 5L) % 16L), 2L)))
    }
  }
}
