package graft.functions

import graft.SparkSpec
import graft.functions.CompressionSignalExpression.deflateLen
import org.apache.spark.sql.functions._

class CompressionSignalSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: String*): Seq[Double] =
    texts.toDF("t")
      .select((deflateLen(col("t")).cast("double") /
        octet_length(col("t")).cast("double")).as("r"))
      .as[Double].collect().toSeq

  test("deflate ratio separates repetition, prose, and noise") {
    val repetitive = "click here to subscribe " * 80
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "sailors argue about the provenance of an antique sextant found " +
      "beneath the floorboards of a harbourside tavern in late autumn."
    val noise = new scala.util.Random(3).alphanumeric.take(2000).mkString
    val Seq(rRep, rProse, rNoise) = ratios(repetitive, prose, noise)
    assert(rRep < 0.1, s"repetition should collapse, got $rRep")
    assert(rProse > 0.3 && rProse < 1.0, s"prose mid-band, got $rProse")
    assert(rNoise > rProse, s"noise should resist compression, got $rNoise vs $rProse")
  }

  test("kernel matches java.util.zip on exact byte counts; empty and null behave") {
    val t = "hello hello hello"
    val expected = {
      val d = new java.util.zip.Deflater()
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val got = Seq(t).toDF("t").select(deflateLen(col("t"))).as[Int].head()
    assert(got === expected)
    val onEmptyAndNull = Seq(Some(""), None).toDF("t")
      .select(deflateLen(col("t"))).as[Option[Int]].collect()
    assert(onEmptyAndNull(0).exists(_ > 0), "empty string still has a deflate header")
    assert(onEmptyAndNull(1).isEmpty, "null stays null")
  }

  test("q146 report: ratios in (0, 1.2], boilerplate count bounded by doc count") {
    val rows = graft.SparkEntry.queries("q146_compression_quality")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("ratio")
      assert(ratio > 0.0 && ratio < 1.2, s"ratio out of band: $ratio")
      assert(r.getAs[Long]("n_boilerplate") <= r.getAs[Long]("n_docs"))
    }
  }
}
