package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe windowed prefix aggregation over LOW-CARDINALITY partition
  * keys — the two-phase replacement for
  * `sum(v) OVER (PARTITION BY key ORDER BY ord ROWS UNBOUNDED PRECEDING)`
  * when `key` has few values (lang, source, difficulty bucket, …).
  *
  * The plain window hash-shuffles on `key` alone, so EVERY row of a key
  * passes through ONE task: a 2-value key column sorts half a 100 TB corpus
  * in a single reducer. Here each key group is additionally split into
  * `S` stripes by a function of the ORDER key that is monotone
  * non-decreasing in it (a range bucket), so:
  *
  *   1. the per-row window runs per (key, stripe) — parallelism is
  *      |keys| × S, never |keys|;
  *   2. per-(key, stripe) totals are a tiny aggregate (|keys| × S rows);
  *   3. an exclusive scan over the stripe totals (a window over that tiny
  *      table — |keys| × S rows, NOT the data) yields each stripe's offset,
  *      which broadcast-joins back: `cum = intra-stripe prefix + offset`.
  *
  * Monotonicity of the stripe in the order key is what makes the sum exact:
  * every row of an earlier stripe precedes every row of a later stripe in
  * the key group's global order, so "rows before me" = "my stripe's rows
  * before me" + "all rows of earlier stripes". Rows with EQUAL order keys
  * land in the same stripe by construction (the stripe is a function of the
  * order key), so no tie straddles a boundary.
  *
  * Cost shape: the input is scanned twice (once for the striped window,
  * once for the stripe totals) plus once more if the stripe derives from a
  * min/max statistics pass ([[withRangeStripe]]) — three scans that each
  * parallelize over the whole cluster, traded against a single-task sort
  * that does not. A production pipeline caches the striped input; the
  * declared queries stay pure-lazy.
  *
  * Null contract: key, order, and value columns must be non-null (the
  * driver tables are); a null order key has no defined stripe or position.
  *
  * Determinism contract: the key/order/value expressions AND the input's
  * lineage must be deterministic. [[runningSum]] evaluates them in two
  * independent passes over `df` (the striped window and the stripe-totals
  * aggregate); a nondeterministic expression — or a nondeterministic
  * upstream (rand, an unstable sample, a re-read mutable source) — makes
  * the broadcast offsets inconsistent with the intra-stripe sums and the
  * cumulative values silently wrong, with no error raised. The same rule
  * applies to any plan that scans its input twice.
  *
  * Runtime note: like every ROWS-frame window, each (key, stripe) group
  * still sorts in memory within its task — the stripes bound the SIZE of
  * that sort, which is the point.
  */
object StripedWindow {

  /** Internal stripe column; inputs must not already use this name. */
  val StripeCol = "__stripe"

  /** 16 uniform monotone stripes over an md5-hex order key: its first hex
    * character. md5 hex sorts lexicographically and is uniform by
    * construction, so the first character is simultaneously a range bucket
    * (monotone prefix of the order key) and an even 16-way split — no
    * statistics pass needed. */
  def hexStripe(md5Col: Column): Column = substring(md5Col, 1, 1)

  /** Adds [[StripeCol]]: `numStripes` equal-WIDTH range buckets over a
    * NUMERIC order column, cut from one min/max aggregate that rides in as
    * a broadcast 1-row cross join (lazy, no driver-side pass).
    *
    * min/max equal-width — not percentile equal-depth — on purpose, twice
    * over:
    *   - exact Percentile buffers every DISTINCT order value in one final
    *     reducer; on a unique key like doc_id that single-task statistics
    *     pass is the very bottleneck the striping removes;
    *   - approx_percentile bounds the memory but its sketch merge is
    *     order-sensitive, and [[runningSum]] evaluates this subtree in TWO
    *     independent passes — cut points that can differ between passes
    *     violate the determinism contract and corrupt the offsets silently.
    *   min/max merges are commutative (order-independent), O(1) memory, and
    *   stripe cuts only need monotone non-decreasing values: ANY cuts yield
    *   a bucket monotone in `orderCol`, so the identity to the plain window
    *   is unaffected — at worst the stripes are uneven.
    *
    * `floor((x − min) / width)` (clamped to [0, numStripes−1]) is monotone
    * non-decreasing in `orderCol`, and equal order values share a stripe by
    * construction. Trade: equal-width buckets mirror the VALUE distribution,
    * so a skewed order key concentrates rows in few stripes — and heavy ties
    * collapse stripes entirely (all ties share one bucket), the same caveat
    * as any range partitioning. Use a higher-resolution or uniformized order
    * column (e.g. [[hexStripe]] on an md5) when one value dominates.
    *
    * Precision caveat: the cuts are computed in double, so integral order
    * keys beyond 2^53 lose low bits. This CANNOT break correctness — the
    * double cast is monotone non-decreasing and ties (including cast-induced
    * ones) share a stripe by construction — but keys whose spread lives
    * below the lost bits can collapse into fewer distinct stripes, degrading
    * the parallelism the striping exists for. For id spaces wider than 2^53
    * (snowflake ids, 64-bit hashes), stripe on a uniformized key instead
    * ([[hexStripe]] on an md5 of the id). */
  def withRangeStripe(df: DataFrame, orderCol: String, numStripes: Int): DataFrame = {
    require(numStripes >= 2, s"numStripes must be >= 2, got $numStripes")
    val cuts = df.agg(
      min(col(orderCol)).cast("double").as("__lo"),
      max(col(orderCol)).cast("double").as("__hi"))
    val width = (col("__hi") - col("__lo")) / numStripes
    val raw = floor((col(orderCol).cast("double") - col("__lo")) / width).cast("int")
    val stripe = when(col("__hi") === col("__lo"), lit(0)) // degenerate: one value
      .otherwise(least(greatest(raw, lit(0)), lit(numStripes - 1)))
    df.crossJoin(broadcast(cuts))
      .withColumn(StripeCol, stripe)
      .drop("__lo", "__hi")
  }

  /** Running sum of `valCol` per `keyCols` group in `orderCols` order —
    * value-identical to
    * `sum(valCol) OVER (PARTITION BY keyCols ORDER BY orderCols
    *    ROWS BETWEEN UNBOUNDED PRECEDING AND {CURRENT ROW | 1 PRECEDING})`
    * — computed per (key, stripe) with broadcast stripe offsets. `df` must
    * already carry [[StripeCol]] (from [[withRangeStripe]], [[hexStripe]],
    * or any caller-supplied bucket monotone in `orderCols`).
    *
    * The exclusive form is derived as `inclusive − value` rather than a
    * 1-PRECEDING frame, so no row is ever null (no coalesce; works for any
    * numeric value type). A running COUNT (= row_number when the order key
    * is unique) is `valCol = lit(1L)`, `includeCurrent = true`.
    */
  def runningSum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                 valCol: Column, out: String, includeCurrent: Boolean): DataFrame = {
    require(df.columns.contains(StripeCol),
      s"runningSum needs a $StripeCol column — derive one with withRangeStripe/hexStripe")
    val grp = keyCols :+ StripeCol
    val w = Window.partitionBy(grp.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra =
      if (includeCurrent) sum(valCol).over(w)
      else sum(valCol).over(w) - valCol
    // Stripe totals + exclusive scan: the window below is keyed by the bare
    // key, but over the AGGREGATED table (|keys| × stripes rows) — the one
    // place a low-cardinality window is safe because its input is tiny.
    val offW = Window.partitionBy(keyCols.map(col): _*).orderBy(col(StripeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = df.groupBy(grp.map(col): _*)
      .agg(sum(valCol).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(offW) - col("__tot"))
      .drop("__tot")
    df.withColumn("__intra", intra)
      .join(broadcast(offsets), grp)
      .withColumn(out, col("__intra") + col("__off"))
      .drop("__intra", "__off")
  }
}
