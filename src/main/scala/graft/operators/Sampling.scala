package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / split operators (SURVEY.md §2.3).
  *
  * The reference's balanced sampler (X1, src/main.py:67-69) is an unseeded
  * per-class uniform sample; both variants here are deterministic — at 100 TB
  * a nondeterministic sample makes every downstream result unreproducible.
  *
  * Both are a single hash-shuffle on the class key (window per class); no
  * global sort, no driver collect.
  */
object Sampling {

  /** Exact-n per-class sample ordered by a content hash: reproducible across
    * engines (md5 exists in Spark and DuckDB alike). Adds `sample_rank`
    * (1-based within class). */
  def deterministicSample(df: DataFrame, classCols: Seq[String], hashKey: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(classCols.map(col): _*).orderBy(md5(hashKey), hashKey)
    df.withColumn("sample_rank", row_number().over(w)).filter(col("sample_rank") <= n)
  }

  /** Exact-n per-class pseudo-random sample with a seed (the reference's
    * semantics, made deterministic). Orders by a seeded CONTENT hash, not
    * rand(seed): rand is only reproducible for a fixed input partitioning —
    * a different file-split layout or an upstream repartition would silently
    * change the sample (and anything derived from it, like
    * SentimentPipeline's dataset-version fingerprint). xxhash64(seed, row)
    * depends only on row values; ties occur only between fully identical
    * rows, which are interchangeable.
    *
    * `keyCols` picks which columns feed the hash. The default uses every
    * HASHABLE column sorted by name — map-typed columns are excluded
    * (xxhash64 rejects maps at analysis) and the name sort makes the draw
    * independent of column ORDER. The drawn sample still changes if columns
    * are added or removed; pass an explicit stable key subset (e.g. the
    * row's natural id) when the schema is expected to evolve. */
  def balancedSample(df: DataFrame, classCol: String, nPerClass: Int, seed: Long,
                     keyCols: Seq[String] = Nil): DataFrame = {
    val keys =
      if (keyCols.nonEmpty) keyCols
      else df.schema.fields
        .filterNot(f => hasMapType(f.dataType))
        .map(_.name).sorted.toIndexedSeq
    require(keys.nonEmpty, "balancedSample: no hashable columns to key the draw on")
    val w = Window.partitionBy(classCol).orderBy(xxhash64(lit(seed) +: keys.map(col): _*))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= nPerClass)
      .drop("sample_rank")
  }

  /** xxhash64 refuses MapType anywhere in a column's type (map ordering is
    * undefined, so its hash would be too) — recurse to catch nested maps. */
  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMapType(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
    case _ => false
  }

  /** 80/20-style split (reference X3, src/main.py:89). */
  def trainValidSplit(df: DataFrame, trainFraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, valid) = df.randomSplit(Array(trainFraction, 1.0 - trainFraction), seed)
    (train, valid)
  }
}
