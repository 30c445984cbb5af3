package graft.operators

import graft.functions.BottomKRows
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling / split operators (SURVEY.md §2.3).
  *
  * The reference's balanced sampler (X1, src/main.py:67-69) is an unseeded
  * per-class uniform sample; both variants here are deterministic — at 100 TB
  * a nondeterministic sample makes every downstream result unreproducible.
  *
  * Scale shape: NOT a `row_number()` window. A window partitioned by the
  * class column serializes each class through one task — a 2-class corpus
  * sorts half the data in a single reducer. Both samplers instead run one
  * [[BottomKRows]] aggregation: the map side keeps at most n candidate rows
  * per class per partition in a bounded heap, the shuffle carries only those
  * survivors (≤ n·classes·partitions heap buffers, never the data), and the
  * final merge is the exact bottom-n. No per-class sort exists anywhere in
  * the plan, so class cardinality never bounds parallelism.
  *
  * NULL CONTRACT: rows whose order key is null are excluded from the sample
  * (a null hash has no defined position; the driver tables have no null
  * keys). This differs from the window form, which ranked null-key rows
  * first (ASC NULLS FIRST) — callers with nullable keys must coalesce the
  * key or accept exclusion.
  *
  * Runtime note: past spark.sql.objectHashAggregate.sortBased.fallbackThreshold
  * (default 128) distinct classes per task, ObjectHashAggregateExec falls
  * back to sort-based aggregation AT RUNTIME — a sort over (class, heap
  * buffer) partial rows, still partition-parallel, so the "class cardinality
  * never bounds parallelism" argument holds; only the plan-level "no Sort"
  * claim is initial-plan-only.
  */
object Sampling {

  /** Column names the sampler itself introduces; caller columns must not
    * collide (checked loudly below — silently dropping them would lose a
    * legitimately `__`-named caller column with no warning). */
  private val TempCols = Set("__sample", "__pos", "__row")

  /** One bounded-heap pass: the n rows with the smallest `orderKey` per
    * class, exploded back to rows with their 1-based `sample_rank`. A
    * pre-existing `sample_rank` column is replaced (matching the window
    * form's withColumn semantics). Only the sampler's OWN temp names are
    * reserved — any other caller column, `__`-prefixed or not, passes
    * through untouched. */
  private def sampleByOrderKey(df: DataFrame, classCols: Seq[String],
                               orderKey: Column, n: Int): DataFrame = {
    val clash = df.columns.filter(TempCols)
    require(clash.isEmpty,
      s"sampler temp-column collision: rename input column(s) ${clash.mkString(", ")}")
    val keep = df.columns.filterNot(_ == "sample_rank").toIndexedSeq
    val rowStruct = struct(keep.map(col): _*)
    df.groupBy(classCols.map(col): _*)
      .agg(BottomKRows.bottomK(orderKey, rowStruct, n).as("__sample"))
      .select(posexplode(col("__sample")).as(Seq("__pos", "__row")))
      .select(col("__row.*"), (col("__pos") + 1).as("sample_rank"))
  }

  /** Exact-n per-class sample ordered by a content hash: reproducible across
    * engines (md5 exists in Spark and DuckDB alike). Adds `sample_rank`
    * (1-based within class). Selection and ranks are identical to
    * `row_number() OVER (PARTITION BY class ORDER BY md5(key), key)` for
    * STRING keys: md5 hex is fixed-width, so concatenating the tiebreak key
    * preserves the (md5, key) lexicographic order byte-for-byte — and an md5
    * tie IS a key tie, so the tiebreak only orders duplicate keys. For
    * non-string keys the tiebreak compares the key CAST TO STRING
    * lexicographically rather than in native order — observable only if two
    * DISTINCT key values collide on md5, which does not occur in practice. */
  def deterministicSample(df: DataFrame, classCols: Seq[String], hashKey: Column, n: Int): DataFrame =
    sampleByOrderKey(df, classCols, concat(md5(hashKey), hashKey.cast("string")), n)

  /** Exact-n per-class pseudo-random sample with a seed (the reference's
    * semantics, made deterministic). Orders by a seeded CONTENT hash, not
    * rand(seed): rand is only reproducible for a fixed input partitioning —
    * a different file-split layout or an upstream repartition would silently
    * change the sample (and anything derived from it, like
    * SentimentPipeline's dataset-version fingerprint). xxhash64(seed, row)
    * depends only on row values; ties occur only between fully identical
    * rows, which are interchangeable.
    *
    * The signed xxhash64 is encoded sign-flipped as zero-padded hex so the
    * heap's byte order equals signed numeric order (same draw as the window
    * form ever produced).
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
    val orderKey = lpad(
      hex(xxhash64(lit(seed) +: keys.map(col): _*).bitwiseXOR(lit(Long.MinValue))),
      16, "0")
    sampleByOrderKey(df, Seq(classCol), orderKey, nPerClass).drop("sample_rank")
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

  /** Probability-proportional-to-size SYSTEMATIC sample: walk the corpus in
    * `idCol` order, drop a pin every `step = max(total_weight div targetN, 1)`
    * weight units, keep the rows a pin lands in. Every row's inclusion
    * probability is proportional to its weight (the mixture-subsampling
    * primitive: token-weighted corpus thinning keeps the TOKEN distribution,
    * where uniform row sampling would skew it toward short documents), and
    * rows heavier than `step` are kept with `n_hits > 1` so downstream
    * weighting stays unbiased — a PPS sample that silently capped
    * multiplicity would under-represent exactly the heavy rows it exists
    * to keep.
    *
    * Everything is integer arithmetic over an exclusive prefix sum, so the
    * selection is deterministic and cross-engine exact. The prefix sum runs
    * STRIPED ([[StripedWindow]], q36's machinery): 16 range stripes over
    * `idCol`, so no single task ever owns the corpus-wide ordered scan. The
    * 1-row total rides the broadcast scalar idiom.
    */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String,
                    targetN: Long, stripes: Int = 16): DataFrame = {
    require(targetN >= 1, "targetN must be positive")
    val t = df.withColumn("__w", col(weightCol).cast("long"))
    val striped = StripedWindow.withRangeStripe(t, idCol, stripes)
    val c = StripedWindow.runningSum(striped, Nil, Seq(col(idCol)),
        col("__w"), "cum_before", includeCurrent = false)
      .drop(StripedWindow.StripeCol)
    val total = t.agg(sum(col("__w")).as("__total"))
    c.crossJoin(broadcast(total))
      .withColumn("__step", greatest(expr(s"__total div $targetN"), lit(1L)))
      .withColumn("n_hits",
        expr("((cum_before + __w) div __step) - (cum_before div __step)"))
      .filter(col("n_hits") >= 1)
      .drop("__w", "__total", "__step")
  }
}
