package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a session WITH the extensions installed (isolated from the shared
  * test session — extensions only apply at session construction). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_* SQL functions resolve and compute") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `.config("spark.sql.extensions", "graft.GraftExtensions")` is the
      // production route, but it's a STATIC conf — ignored when a
      // SparkContext already exists (as in this suite). withExtensions is
      // the per-session API and exercises the same injection path.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        val row = spark.sql(
          """SELECT graft_stem('connection') AS s,
            |  graft_is_stopword('the') AS sw1, graft_is_stopword('The') AS sw2,
            |  graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
            |               array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
            |""".stripMargin).collect().head
        assert(row.getAs[String]("s") == "connect")
        assert(row.getAs[Boolean]("sw1"))
        assert(!row.getAs[Boolean]("sw2"), "case-sensitive")
        assert(math.abs(row.getAs[Double]("c") - 1.0) < 1e-12)

        val kernelRow = spark.sql(
          """SELECT graft_clean_tokens('the Spark engine runs fast') AS ct,
            |  graft_stem_tokens(array('connections', 'running')) AS st,
            |  graft_shingles('a b c d', 3) AS sh,
            |  graft_positional_grams('a b a b', 2) AS pg,
            |  graft_simhash('spark engine', 16) AS sim,
            |  graft_token_ids(array('spark'), 1000) AS ids,
            |  graft_top_token_count(array('a', 'b', 'a')) AS ttc,
            |  graft_minhash_sig('a b c d', 3, 4) AS mh
            |""".stripMargin).collect().head
        assert(kernelRow.getAs[scala.collection.Seq[String]]("ct") == Seq("Spark", "engine", "runs", "fast"))
        assert(kernelRow.getAs[scala.collection.Seq[String]]("st") == Seq("connect", "run"))
        assert(kernelRow.getAs[scala.collection.Seq[String]]("sh") == Seq("a b c", "b c d"))
        assert(kernelRow.getAs[scala.collection.Seq[String]]("pg") == Seq("a b", "b a", "a b"),
          "ordered with repeats, unlike shingles' distinct")
        // same value the composable md5-based expressions produce
        val mirror = spark.sql(
          """SELECT graft_simhash('spark engine', 16) = graft_simhash('spark  ENGINE', 16) AS ci,
            |  graft_token_ids(array('spark'), 1000)[0] =
            |    CAST(conv(substring(md5('spark'), 1, 15), 16, 10) AS BIGINT) % 1000 AS idok
            |""".stripMargin).collect().head
        assert(mirror.getAs[Boolean]("ci"), "simhash tokenization lowercases")
        assert(mirror.getAs[Boolean]("idok"), "token id matches the md5 definition")
        assert(kernelRow.getAs[Int]("ttc") == 2)
        // matches the composable md5 definition: min over the two shingles
        // of the seed-0 hash in slot 0
        val mh0 = spark.sql(
          """SELECT least(
            |  CAST(conv(substring(md5('0:a b c'), 1, 15), 16, 10) AS BIGINT),
            |  CAST(conv(substring(md5('0:b c d'), 1, 15), 16, 10) AS BIGINT)) AS v
            |""".stripMargin).collect().head.getAs[Long]("v")
        assert(kernelRow.getSeq[Long](kernelRow.fieldIndex("mh")).head == mh0,
          "minhash slot 0 matches md5 definition")

        // FuseCosineRule: the composable HOF cosine optimizes into the
        // fused expression, with identical values
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
          .limit(50)
        val composed = emb.select(col("vec_id"),
          graft.functions.VectorFns.cosine(col("embedding"), col("embedding")).as("c"))
        val optimized = composed.queryExecution.optimizedPlan.toString
        assert(optimized.contains("cosinesimilarityexpr") ||
          optimized.contains("CosineSimilarityExpr"), s"rule did not fire:\n$optimized")
        assert(composed.collect().forall(r => math.abs(r.getAs[Double]("c") - 1.0) < 1e-9))
      } finally {
        // the shared SparkContext lives on; just restore session bookkeeping
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
