package graft.ml

import graft.functions.TextFns
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text → fixed-width dense feature vector (SURVEY.md §2.5 F4 substitute).
  *
  * The reference embeds with a DistilBERT CLS vector (src/main.py:82-86);
  * torch has no JVM/Spark-native equivalent, so the capability — "text to a
  * fixed-length numeric vector usable as classifier features" — is served by
  * hashing-TF + IDF over the cleaned, stemmed tokens (SURVEY §7 phase 3).
  * Width defaults to 768 to match the reference's embedding shape.
  *
  * Scale: HashingTF is stateless/one-pass; IDF is one aggregate over the
  * corpus. Both stream — no vocabulary broadcast beyond `numFeatures`.
  */
final case class TextFeaturizer(idf: IDFModel, numFeatures: Int) {
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
    new HashingTF().setInputCol("graft_tokens").setOutputCol("graft_tf")
      .setNumFeatures(numFeatures).write.overwrite().save(s"$path/tf")
    idf.write.overwrite().save(s"$path/idf")
  }
}

object TextFeaturizer {
  def load(path: String): TextFeaturizer =
    TextFeaturizer(IDFModel.load(s"$path/idf"), HashingTF.load(s"$path/tf").getNumFeatures)
}

object Features {

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
    TextFeaturizer(idf, numFeatures)
  }
}
