package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Extensions-enabled session (same isolation dance as GraftExtensionsSpec)
  * proving the unbounded-levenshtein comparisons rewrite to the banded
  * threshold kernel AND stay value-identical, nulls included. */
class BoundLevenshteinRuleSpec extends AnyFunSuite {

  test("comparisons against literals rewrite to the threshold form, value-preserving") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-lev-rule-test")
        .withExtensions(new graft.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        import spark.implicits._
        // parquet-backed, not a LocalRelation: ConvertToLocalRelation
        // would otherwise evaluate the filter at optimization time and
        // leave no levenshtein in the plan to inspect
        val dir = java.nio.file.Files.createTempDirectory("graft_lev").toString + "/pairs"
        Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
            ("longerleft", "x"), (null, "y"))
          .toDF("a", "b").write.parquet(dir)
        spark.read.parquet(dir).createOrReplaceTempView("pairs")

        def run(pred: String): (String, Seq[String]) = {
          val df = spark.sql(s"SELECT a FROM pairs WHERE $pred")
          (df.queryExecution.optimizedPlan.toString,
            df.collect().map(_.getString(0)).toSeq.sorted)
        }

        // kitten/sitting = 3, abc/abd = 1, same = 0, longerleft/x = 9
        val (p1, r1) = run("levenshtein(a, b) <= 3")
        assert(p1.contains("levenshtein(a#") && p1.contains("Some(3)) >= 0"), p1)
        assert(r1 === Seq("abc", "kitten", "same"))

        val (p2, r2) = run("levenshtein(a, b) < 3")
        assert(p2.contains("Some(2)) >= 0"), p2)
        assert(r2 === Seq("abc", "same"))

        val (p3, r3) = run("levenshtein(a, b) > 3")
        assert(p3.contains("Some(3)) < 0"), p3)
        assert(r3 === Seq("longerleft"))

        val (p4, r4) = run("levenshtein(a, b) >= 3")
        assert(p4.contains("Some(2)) < 0"), p4)
        assert(r4 === Seq("kitten", "longerleft"))

        // commuted literal-first form
        val (p5, r5) = run("3 >= levenshtein(a, b)")
        assert(p5.contains("Some(3)) >= 0"), p5)
        assert(r5 === Seq("abc", "kitten", "same"))

        // a non-literal bound must NOT rewrite
        val (p6, _) = run("levenshtein(a, b) <= length(b)")
        assert(!p6.contains("Some("), p6)
      } finally {
        // do NOT spark.stop(): the builder reused the JVM-wide shared
        // SparkContext, and stopping it would poison every later suite
        // (GraftExtensionsSpec's contract); just restore bookkeeping
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
