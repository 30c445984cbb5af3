package graft.ml

import graft.QuerySpec
import graft.operators.Sampling
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Rows-only QuerySpecs for the ML surface (MLlib fits are not
  * SQL-expressible — SURVEY.md §5 excludes them from the oracle; metric
  * sanity is asserted in MlSpec).
  *
  * The label is derived from the text ("does the doc mention 'spark'"), so
  * the features carry real signal and the evaluation metrics are meaningful,
  * not coin flips.
  */
object MlQueries {

  val q50TrainEval: QuerySpec = QuerySpec.rowsOnly("q50_ml_train_eval") { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
      .withColumn("label", when(col("text").contains("spark"), 1.0).otherwise(0.0))
    val (trainDf, validDf) = Sampling.trainValidSplit(docs, 0.8, seed = 15)
    val featurizer = Features.fit(trainDf, "text", numFeatures = 256)
    val trainF = featurizer.transform(trainDf, "text").cache()
    val validF = featurizer.transform(validDf, "text")
    val (_, runs) = Trainer.trainAndEvaluate(trainF, validF, "bench-run", "na")
    trainF.unpersist()
    runs.orderBy("model_name", "metric")
  }

  val all: Seq[QuerySpec] = Seq(q50TrainEval)
}
