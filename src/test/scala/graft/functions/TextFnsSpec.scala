package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import TextFns._

  private def cleanOne(s: String): Seq[String] = {
    val df = spark.createDataFrame(Seq(Tuple1(s))).toDF("text")
    df.select(cleanTokens(col("text")).as("t")).collect().head.getSeq[String](0)
  }

  test("clean chain: URLs dropped, punctuation stripped, stopwords case-sensitive") {
    assert(cleanOne("Check https://x.co/ab and www.foo.com now!") === Seq("Check"))
    // "The" survives (case-sensitive NLTK semantics), "the" is dropped
    assert(cleanOne("The cat saw the dog") === Seq("The", "cat", "saw", "dog"))
    // punctuation removed before tokenizing: "don't" -> "dont"
    assert(cleanOne("don't stop me") === Seq("dont", "stop"))
    assert(cleanOne("") === Seq.empty)
    assert(cleanOne("https://only.url") === Seq.empty)
  }

  test("stemmed clean chain runs the Catalyst stem expression") {
    val df = spark.createDataFrame(Seq(Tuple1("Connection troubles running happily"))).toDF("text")
    val out = df.select(cleanStemmedTokens(col("text")).as("t")).collect().head.getSeq[String](0)
    assert(out === Seq("Connect", "troubl", "run", "happili"))
  }

  test("encode/pad/mask shapes (F1-F3)") {
    val df = spark.createDataFrame(Seq(
      Tuple1("alpha beta gamma"),
      Tuple1(""),
      Tuple1(Seq.fill(40)("word").mkString(" "))
    )).toDF("text")
    val out = df.select(
      padIds(encodeTokens(cleanTokens(col("text")), 1000), 30).as("ids"),
      attentionMask(padIds(encodeTokens(cleanTokens(col("text")), 1000), 30)).as("mask"))
      .collect()
    out.foreach { case Row(ids: scala.collection.Seq[_], mask: scala.collection.Seq[_]) =>
      assert(ids.length == 30, "padded to exactly 30")
      assert(mask.length == 30)
      assert(mask.forall(m => m == 0 || m == 1))
      assert(ids.forall { case i: Long => i >= 0 && i < 1000 })
    }
    // mask of empty text is all zeros
    assert(out(1).getSeq[Int](1).forall(_ == 0))
  }

  test("kernel forms are value-identical to the composable T1-T5 building blocks") {
    // The kernels (CleanTokensExpr, StemTokensExpr, TokenIdsExpr,
    // TopTokenCountExpr, ShinglesExpr, SimHashExpr) ship the hot paths;
    // the composable forms below remain the semantic DEFINITION. This spec
    // pins them together so neither can drift.
    val tricky = Seq(
      "Check https://x.co/ab and www.foo.com now!",
      "The cat saw the dog; don't stop me... 100% (really)",
      "", "   ", "UPPER lower MiXeD the THE The",
      "unicode: café naïve 中文 emoji 😀 end",
      "a b c d e f g a b c d")
    val df = spark.createDataFrame(tricky.map(Tuple1(_))).toDF("text")
    val composedClean = removeStopwords(tokenize(stripPunct(stripUrls(col("text")))))
    val rows = df.select(
      cleanTokens(col("text")).as("kernel_clean"),
      composedClean.as("composed_clean"),
      stemTokens(cleanTokens(col("text"))).as("kernel_stem"),
      transform(composedClean, t => StemExpression.stem(t)).as("composed_stem"),
      encodeTokens(cleanTokens(col("text")), 997).as("kernel_ids"),
      transform(composedClean, t => tokenId(t, 997)).as("composed_ids")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), "clean chain")
      assert(r.getSeq[String](2) === r.getSeq[String](3), "stemming")
      assert(r.getSeq[Long](4) === r.getSeq[Long](5), "token ids")
    }
  }

  test("kernel null semantics match the composable forms (null input, null elements)") {
    // Latent on today's corpus (no null texts/tokens) but part of the
    // kernels' documented value-identical contract: transform-lambda forms
    // map null elements to null, filter-count forms exclude them, and the
    // whole-input-NULL cases coalesce to 0 where the composable
    // when/array_max forms did.
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('run', CAST(NULL AS STRING), 'run')),
        |  (CAST(NULL AS ARRAY<STRING>)),
        |  (array(CAST(NULL AS STRING), CAST(NULL AS STRING)))
        |AS t(ts)""".stripMargin)
    val rows = df.select(
      stemTokens(col("ts")).as("stems"),
      encodeTokens(col("ts"), 997).as("ids"),
      topTokenCount(col("ts")).as("top"),
      transform(col("ts"), t => StemExpression.stem(t)).as("c_stems"),
      transform(col("ts"), t => tokenId(t, 997)).as("c_ids")).collect()
    assert(rows(0).getSeq[String](0) === rows(0).getSeq[String](3), "null element stems")
    assert(rows(0).getSeq[String](0) === Seq("run", null, "run"))
    assert(rows(0).getSeq[Any](1) === rows(0).getSeq[Any](4), "null element ids")
    assert(rows(0).getInt(2) === 2, "nulls are not counted as tokens")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), "NULL array maps to NULL")
    assert(rows(1).getInt(2) === 0, "NULL array coalesces to count 0")
    assert(rows(2).getInt(2) === 0, "all-null array counts 0")
  }

  test("rolling fingerprint is order-sensitive and stable") {
    val df = spark.createDataFrame(Seq(
      Tuple1("alpha beta"), Tuple1("beta alpha"))).toDF("text")
    val fps = df.select(rollingFingerprint(encodeTokens(cleanTokens(col("text")), 1000)).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) != fps(1), "order must matter")
    val again = df.select(rollingFingerprint(encodeTokens(cleanTokens(col("text")), 1000)).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps.toSeq === again.toSeq)
  }

  test("PII scrub: planted email/ip/phone redacted with typed placeholders") {
    val df = spark.createDataFrame(Seq(
      Tuple1("mail a.b+c@sub.example.org then 10.0.255.3 then 555-0199 done"),
      Tuple1("no pii here"),
      Tuple1("two mails x@y.io z@w.co and v1.2.3 is a version, not an ip")
    )).toDF("text")
    val out = df.select(col("text") +: (piiCounts(col("text")) :+ scrubPii(col("text")).as("s")): _*)
      .collect()
    assert(out(0).getAs[String]("s") === "mail <EMAIL> then <IP> then <PHONE> done")
    assert((out(0).getAs[Long]("n_email"), out(0).getAs[Long]("n_ip"), out(0).getAs[Long]("n_phone"))
      === ((1L, 1L, 1L)))
    assert(out(1).getAs[String]("s") === "no pii here")
    // v1.2.3 has only three octets — not an IP; both mails redact
    assert(out(2).getAs[Long]("n_email") === 2L)
    assert(out(2).getAs[Long]("n_ip") === 0L)
    assert(out(2).getAs[String]("s").contains("version, not an ip"))
  }

  test("repetition primitives: bigrams and top-token count on planted arrays") {
    val df = spark.createDataFrame(Seq(
      Tuple1(Seq("a", "b", "a", "b", "a")),
      Tuple1(Seq("solo")),
      Tuple1(Seq.empty[String])
    )).toDF("ts")
    val out = df.select(bigrams(col("ts")).as("bg"), topTokenCount(col("ts")).as("tt")).collect()
    assert(out(0).getSeq[String](0) === Seq("a b", "b a", "a b", "b a"))
    assert(out(0).getInt(1) === 3)
    assert(out(1).getSeq[String](0) === Seq.empty)
    assert(out(1).getInt(1) === 1)
    assert(out(2).getSeq[String](0) === Seq.empty)
    assert(out(2).getInt(1) === 0)
  }

  test("distinctGramCount equals size(array_distinct(concat_ws grams)) — the q213/q220 form") {
    // planted arrays + a null-bearing one (concat_ws SKIPS nulls) + short docs
    val cases = Seq(
      Seq("a", "b", "a", "b", "a"),
      Seq("x", "x", "x", "x"),
      Seq("solo"), Seq("p", "q"), Seq.empty[String],
      Seq("a", null, "a", "b"),
      Seq("café", "naïve", "café", "naïve", "中文"))
    val df = spark.createDataFrame(cases.map(Tuple1(_))).toDF("ts")
    for (k <- Seq(2, 3)) {
      def expectedGrams: org.apache.spark.sql.Column =
        when(size(col("ts")) >= k,
          transform(sequence(lit(1), size(col("ts")) - (k - 1)), i =>
            concat_ws(" ", (0 until k).map(o => element_at(col("ts"), i + o)): _*)))
          .otherwise(typedlit(Seq.empty[String]))
      val rows = df.select(
        DistinctGramCountExpr.distinctGramCount(col("ts"), k).as("kernel"),
        size(array_distinct(expectedGrams)).as("composed")).collect()
      rows.zip(cases).foreach { case (r, c) =>
        assert(r.getInt(0) === r.getInt(1), s"k=$k on $c")
      }
    }
  }
}
