package graft.ml

import graft.SparkSpec
import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import scala.util.Random

/** End-to-end test of the reference pipeline shape (SURVEY.md §3.1-3.2) on a
  * generated Sentiment140-format CSV: headerless, latin-1, 6 columns, labels
  * {0,4}, with learnable word signal.
  */
class SentimentPipelineSpec extends SparkSpec {

  private val posWords = Seq("love", "great", "happy", "awesome", "best")
  private val negWords = Seq("hate", "awful", "sad", "terrible", "worst")
  private val fillers = Seq("today", "really", "just", "going", "weather", "coffee", "work")

  private def makeCsv(n: Int): String = {
    val rnd = new Random(42)
    val dir = Files.createTempDirectory("graft_s140").toString
    val path = s"$dir/tweets.csv"
    val rows = (0 until n).map { i =>
      val pos = i % 2 == 0
      val signal = (if (pos) posWords else negWords)(rnd.nextInt(5))
      val noise = Seq.fill(4)(fillers(rnd.nextInt(fillers.length))).mkString(" ")
      val sentiment = if (pos) 4 else 0
      // quoted tweet text with URL + punctuation to exercise the clean chain
      s"""$sentiment,$i,"Mon Apr 06 22:19:45 PDT 2009",NO_QUERY,user$i,"I $signal this! $noise http://t.co/x$i""""
    }
    Files.write(Paths.get(path), rows.mkString("\n").getBytes(Charset.forName("ISO-8859-1")))
    path
  }

  test("train entry point: balanced sample, 5 model metrics, learnable signal") {
    val csv = makeCsv(600)
    val modelDir = Files.createTempDirectory("graft_models").toString
    val trained = SentimentPipeline.train(spark, csv, total = 400, modelDir = Some(modelDir))

    // balanced sampler produced both classes (X1/X2)
    assert(trained.version.nonEmpty)
    val runs = trained.runs.collect()
    val models = runs.map(_.getAs[String]("model_name")).distinct.sorted
    assert(models.toSeq == Seq(
      "gaussian_nb", "linear_svc", "logistic_regression", "random_forest", "rff_svc"))
    // 8 metrics per model (tn/fp/fn/tp/precision/recall/accuracy/data_size)
    assert(runs.length == models.length * 8)
    // the word signal is learnable: logistic regression beats 0.8 accuracy
    val lrAcc = runs.find(r => r.getAs[String]("model_name") == "logistic_regression"
      && r.getAs[String]("metric") == "accuracy").get.getAs[Double]("value")
    assert(lrAcc > 0.8, s"logistic_regression accuracy $lrAcc")
    // M6: models + registry persisted
    assert(Files.exists(Paths.get(s"$modelDir/logistic_regression")))
    assert(Files.exists(Paths.get(s"$modelDir/_registry")))
    // M6 load-back: a fresh process would load by registry path and score
    val registry = spark.read.parquet(s"$modelDir/_registry").collect()
      .map(r => r.getAs[String]("model_name") -> r.getAs[String]("path")).toMap
    val loaded = org.apache.spark.ml.classification.LogisticRegressionModel
      .load(registry("logistic_regression"))
    val reScored = loaded.transform(
      trained.featurizer.transform(
        spark.createDataFrame(Seq(Tuple1("I love this awesome great day"))).toDF("tweet"), "tweet"))
    assert(reScored.select("prediction").collect().head.getDouble(0) == 1.0)
  }

  test("cross-validation tunes regularization and beats majority baseline") {
    val csv = makeCsv(400)
    val (sampled, _) = SentimentPipeline.readAndFetchData(spark, csv, total = 300)
    val labeled = sampled.withColumn("label",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("sentiment") === 4, 1.0).otherwise(0.0))
    val featurizer = Features.fit(labeled, "tweet")
    val featurized = featurizer.transform(labeled, "tweet")
    val (cvModel, metrics) = Trainer.tuneLogisticRegression(featurized, folds = 3)
    assert(metrics.length == 4, "one mean metric per grid candidate")
    assert(metrics.max > 0.9, s"separable signal -> high AUC, got ${metrics.toSeq}")
    val preds = cvModel.transform(featurized)
    val acc = Trainer.confusion(preds).collect().head.getAs[Double]("accuracy")
    assert(acc > 0.8, s"tuned accuracy $acc")
  }

  test("golden: balanced sampler reproduces the reference artifact shape") {
    // the reference's only committed output is data/tweets_1000.csv — 1000
    // rows, exactly 500 per class, sampler format (SURVEY §5 golden test)
    val csv = makeCsv(4000)
    val outDir = Files.createTempDirectory("graft_versioned").toString
    val (sampled, version) = SentimentPipeline.readAndFetchData(
      spark, csv, total = 1000, versionedDir = Some(outDir))
    val counts = sampled.groupBy("sentiment").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> 500L, 4 -> 500L), s"got $counts")
    // versioned sink: directory named by the content fingerprint, header on
    val back = spark.read.option("header", "true").csv(s"$outDir/$version")
    assert(back.columns.toSeq == Seq("sentiment", "tweet"),
      "sampler output format (no pandas index column — documented deviation)")
    assert(back.count() == 1000)
    // content-addressed: same inputs → same version id
    val (_, v2) = SentimentPipeline.readAndFetchData(spark, csv, total = 1000)
    assert(v2 == version)
  }

  test("full pipeline round-trip: fresh session loads from disk and scores identically") {
    import spark.implicits._
    val csv = makeCsv(300)
    val dir = Files.createTempDirectory("graft_roundtrip").toString
    val trained = SentimentPipeline.train(spark, csv, total = 200, modelDir = Some(dir))
    val texts = Seq("I love this awesome day", "I hate this terrible thing")
    val direct = SentimentPipeline.scoreBatch(texts.toDF("text"), "text", trained)
      .orderBy("tweet").collect().map(_.toSeq)
    // a fresh session stands in for a restarted process: nothing in-memory
    // survives; everything must come back from the model directory
    val fresh = spark.newSession()
    val loaded = SentimentPipeline.loadTrained(fresh, dir)
    assert(loaded.version == trained.version, "dataset version round-trips")
    assert(loaded.models.keySet == trained.models.keySet)
    val batch = fresh.createDataFrame(texts.map(Tuple1(_))).toDF("text")
    val replayed = SentimentPipeline.scoreBatch(batch, "text", loaded)
      .orderBy("tweet").collect().map(_.toSeq)
    assert(replayed.toSeq == direct.toSeq,
      "loaded featurizer + models reproduce in-memory predictions exactly")
  }

  test("streaming inference: files in, scored parquet out, checkpoint restart") {
    val csv = makeCsv(300)
    val trained = SentimentPipeline.train(spark, csv, total = 200)
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString + "/scored"
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    Files.write(Paths.get(s"$inDir/a.txt"), "I love this awesome day".getBytes)
    Files.write(Paths.get(s"$inDir/b.txt"), "I hate this terrible thing".getBytes)
    // maxFilesPerTrigger=1 => the two files arrive as two micro-batches
    SentimentPipeline.runStreamingInference(spark, inDir, trained, outDir, ckDir)
    // batch_id is a partition directory now (idempotent per-batch overwrite);
    // partition inference may narrow its type, so compare through a cast
    val first = spark.read.parquet(outDir)
      .withColumn("batch_id", org.apache.spark.sql.functions.col("batch_id").cast("long"))
      .collect()
    assert(first.length == 2)
    assert(first.map(_.getAs[Long]("batch_id")).distinct.length == 2, ">=2 micro-batches")
    val preds = first.map(r => r.getAs[String]("tweet") -> r.getAs[Double]("pred_logistic_regression")).toMap
    assert(preds("I love this awesome day") == 1.0 && preds("I hate this terrible thing") == 0.0)
    // restart against the SAME checkpoint: only the new file is scored
    Files.write(Paths.get(s"$inDir/c.txt"), "what a great happy best time".getBytes)
    SentimentPipeline.runStreamingInference(spark, inDir, trained, outDir, ckDir)
    val after = spark.read.parquet(outDir).collect()
    assert(after.length == 3, "checkpoint prevents rescoring already-seen files")
    assert(after.map(r => r.getAs[String]("tweet")).distinct.length == 3)
  }

  test("word2vec featurizer: learned embedding trains, persists, reloads with exact parity") {
    import spark.implicits._
    val csv = makeCsv(300)
    val (sampled, _) = SentimentPipeline.readAndFetchData(spark, csv, total = 200)
    val w2v = Features.fitWord2Vec(sampled, "tweet", vectorSize = 16)
    val out = w2v.transform(sampled, "tweet")
    assert(out.schema("features").dataType.typeName == "vector")
    val vecs = out.select("features").limit(5).collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    assert(vecs.forall(_.size == 16))
    assert(vecs.exists(_.toArray.exists(_ != 0.0)), "learned vectors are non-trivial")
    // disk round-trip through the SAME loader the registry uses; the kind is
    // recovered from the layout, and the transform is float-exact
    val dir = Files.createTempDirectory("graft_w2v").toString
    w2v.save(dir)
    val loaded = TextFeaturizer.load(dir)
    assert(loaded.isInstanceOf[Word2VecFeaturizer])
    val texts = Seq("I love this awesome day", "I hate this terrible thing").toDF("tweet")
    val direct = w2v.transform(texts, "tweet").select("features").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toArray.toSeq)
    val replayed = loaded.transform(texts, "tweet").select("features").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toArray.toSeq)
    assert(replayed.toSeq == direct.toSeq, "loaded embedding scores identically")
  }

  test("inference entry point: fan-out scoring adds one column per model") {
    import spark.implicits._
    val csv = makeCsv(300)
    val trained = SentimentPipeline.train(spark, csv, total = 200)
    val batch = Seq("I love this awesome day", "I hate this terrible thing")
      .toDF("text")
    val scored = SentimentPipeline.scoreBatch(batch, "text", trained)
    val predCols = scored.columns.filter(_.startsWith("pred_")).sorted
    assert(predCols.toSeq == Seq("pred_gaussian_nb", "pred_linear_svc",
      "pred_logistic_regression", "pred_random_forest", "pred_rff_svc"))
    val rows = scored.collect()
    assert(rows.length == 2)
    // lr learned the signal: positive text → 1.0, negative → 0.0
    val lr = rows.map(r => r.getAs[String]("tweet") -> r.getAs[Double]("pred_logistic_regression")).toMap
    assert(lr("I love this awesome day") == 1.0)
    assert(lr("I hate this terrible thing") == 0.0)
  }
}
