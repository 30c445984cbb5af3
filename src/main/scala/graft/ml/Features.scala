package graft.ml

import graft.functions.TextFns
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Word2Vec, Word2VecModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text → fixed-width dense feature vector (SURVEY.md §2.5 F4 substitute).
  *
  * The reference embeds with a DistilBERT CLS vector (src/main.py:82-86);
  * torch has no JVM/Spark-native equivalent, so the capability — "text to a
  * fixed-length numeric vector usable as classifier features" — is served by
  * two on-JVM featurizers behind one interface:
  *
  *  - [[TfIdfFeaturizer]] (default): hashing-TF + IDF over the cleaned,
  *    stemmed tokens. Width defaults to 768 to match the reference's
  *    embedding shape. Stateless map + one corpus aggregate.
  *  - [[Word2VecFeaturizer]]: MLlib Word2Vec — a LEARNED dense embedding
  *    (averaged word vectors), the closer analogue to the reference's
  *    neural embedding. Training shuffles the vocabulary once per
  *    iteration; transform is a broadcast-dictionary lookup + average.
  *
  * Both persist under a one-subdir-per-kind layout so
  * [[TextFeaturizer.load]] can rebuild either from disk alone.
  */
sealed trait TextFeaturizer {
  def transform(df: DataFrame, textCol: String): DataFrame
  def save(path: String): Unit
}

final case class TfIdfFeaturizer(idf: IDFModel, numFeatures: Int) extends TextFeaturizer {
  def transform(df: DataFrame, textCol: String): DataFrame =
    idf.transform(Features.rawTf(df, textCol, numFeatures))
      .drop("graft_tokens", "graft_tf")

  /** Persist both halves of the fitted featurizer — the IDF model (the
    * learned state) and a HashingTF carrying `numFeatures` (the config) —
    * so a RESTARTED process can score without refitting. The reference
    * round-trips its whole model through the registry
    * (/root/reference/src/main.py:123,143-145); without this, saved
    * classifiers were unusable after restart because the feature transform
    * was lost. */
  def save(path: String): Unit = {
    // a prior Word2Vec save at this path would otherwise win the kind probe
    // forever (overwrite never clears the OTHER kind's layout)
    Features.deleteLayout(path, "w2v")
    new HashingTF().setInputCol("graft_tokens").setOutputCol("graft_tf")
      .setNumFeatures(numFeatures).write.overwrite().save(s"$path/tf")
    idf.write.overwrite().save(s"$path/idf")
  }
}

/** Learned dense embedding (averaged skip-gram word vectors) over the same
  * cleaned, stemmed token stream — value-compatible with TfIdf downstream
  * (same `features` VectorUDT column). */
final case class Word2VecFeaturizer(model: Word2VecModel) extends TextFeaturizer {
  def transform(df: DataFrame, textCol: String): DataFrame =
    model.transform(
      df.withColumn("graft_tokens", TextFns.cleanStemmedTokens(col(textCol))))
      .drop("graft_tokens")

  def save(path: String): Unit = {
    Features.deleteLayout(path, "tf")
    Features.deleteLayout(path, "idf")
    model.write.overwrite().save(s"$path/w2v")
  }
}

object TextFeaturizer {
  /** Rebuild whichever featurizer was saved: the kind is the on-disk layout
    * itself (w2v/ vs tf/ + idf/), so pre-existing TfIdf saves stay loadable.
    * Probed through the Hadoop FileSystem API so the path's OWN scheme
    * (hdfs://, s3a://, file:) answers — a java.nio probe only ever saw the
    * local disk and mis-loaded every remote save. Saves delete the sibling
    * kind's layout, so a kind flip at the same path can't resurrect a stale
    * model. The w2v probe keys on the save's COMPLETION marker (data/ is
    * the last piece MLlib's writer commits), not bare directory existence:
    * a crashed first save leaves a partial w2v/ that a directory probe
    * would route to Word2VecModel.load forever (ADVICE r17). */
  def load(path: String): TextFeaturizer =
    if (Features.w2vComplete(path))
      Word2VecFeaturizer(Word2VecModel.load(s"$path/w2v"))
    else
      TfIdfFeaturizer(IDFModel.load(s"$path/idf"), HashingTF.load(s"$path/tf").getNumFeatures)
}

object Features {

  /** Both helpers resolve the filesystem FROM the path (not the JVM-local
    * default), so layout probes and sibling deletes work on whatever store
    * the model dir actually lives in. */
  private def hadoopPath(path: String, sub: String) = {
    val p = new org.apache.hadoop.fs.Path(path, sub)
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    (p.getFileSystem(conf), p)
  }

  private[ml] def layoutExists(path: String, sub: String): Boolean = {
    val (fs, p) = hadoopPath(path, sub)
    fs.exists(p)
  }

  /** A Word2Vec save at `path` is COMPLETE: metadata and the data parquet
    * (written last by MLlib's writer, _SUCCESS-committed) both landed. */
  private[ml] def w2vComplete(path: String): Boolean =
    layoutExists(path, "w2v/metadata/_SUCCESS") &&
      layoutExists(path, "w2v/data/_SUCCESS")

  private[ml] def deleteLayout(path: String, sub: String): Unit = {
    val (fs, p) = hadoopPath(path, sub)
    fs.delete(p, true)
  }

  private[ml] def rawTf(df: DataFrame, textCol: String, numFeatures: Int): DataFrame = {
    val tokens = df.withColumn("graft_tokens", TextFns.cleanStemmedTokens(col(textCol)))
    new HashingTF()
      .setInputCol("graft_tokens").setOutputCol("graft_tf")
      .setNumFeatures(numFeatures)
      .transform(tokens)
  }

  /** Fit IDF on a (training) corpus; returns a reusable transformer — the
    * reference's "same setup_data_for_ml for train and inference" shape
    * (src/main.py:166,193). */
  def fit(train: DataFrame, textCol: String, numFeatures: Int = 768,
          outputCol: String = "features"): TextFeaturizer = {
    val idf = new IDF()
      .setInputCol("graft_tf").setOutputCol(outputCol)
      .fit(rawTf(train, textCol, numFeatures))
    TfIdfFeaturizer(idf, numFeatures)
  }

  /** Fit the learned-embedding alternative (seeded, single-threaded
    * per-partition updates — deterministic for a fixed partitioning).
    * minCount=1 keeps small corpora featurizable; production corpora should
    * raise it. */
  def fitWord2Vec(train: DataFrame, textCol: String, vectorSize: Int = 64,
                  seed: Long = 15, minCount: Int = 1,
                  outputCol: String = "features"): TextFeaturizer = {
    val tokens = train.withColumn("graft_tokens", TextFns.cleanStemmedTokens(col(textCol)))
    val model = new Word2Vec()
      .setInputCol("graft_tokens").setOutputCol(outputCol)
      .setVectorSize(vectorSize).setSeed(seed).setMinCount(minCount)
      .fit(tokens)
    Word2VecFeaturizer(model)
  }
}
