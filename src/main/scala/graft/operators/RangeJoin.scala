package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pairs of rows with equal keys whose timestamps are
  * within a bounded offset — `right.ts − left.ts ∈ [lower, upper]` — the
  * second custom temporal operator next to AsOfJoin (SURVEY §2.8 band;
  * DuckDB verifies via a native inequality join).
  *
  * Spark has no range-join optimization: a plain join with the BETWEEN
  * condition plans as an equi-join on the key alone, making every hot key a
  * per-key cross product (quadratic in events-per-user). This operator bins
  * the time axis into `upper − lower`-wide buckets and equi-joins on
  * (key, bin): each right row lands in exactly one bin, each left row's
  * acceptance interval covers at most two bins, so the shuffle moves
  * ≤ 2·|L| + |R| rows, bucket joins touch only same-bin candidates, and a
  * matching pair meets in exactly one bin (the right row's) — no dedup pass
  * needed. The exact BETWEEN predicate then filters within buckets.
  * Long/skewed keys behave like any keyed shuffle (salt if needed).
  */
object RangeJoin {

  /** @param lowerSec/upperSec match window in seconds relative to the LEFT
    *                          timestamp (lower may be negative for look-back;
    *                          requires lower < upper)
    * @param rightValCols      right columns carried onto each matched pair,
    *                          emitted as `r_<name>`; the right timestamp is
    *                          always emitted as `r_ts`. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftTs: String, rightTs: String,
                lowerSec: Long, upperSec: Long,
                rightValCols: Seq[String]): DataFrame = {
    require(lowerSec < upperSec, s"empty range [$lowerSec, $upperSec]")
    // the operator fabricates column names; a collision would surface as
    // ambiguous/duplicate output columns far from the cause, so reject it
    // here where the fix (rename before joining) is obvious. Only names that
    // SURVIVE into the output can clash: everything from the left, the key
    // columns, and the generated names themselves (e.g. rightTs="ts" plus a
    // "ts" value column would both emit r_ts).
    val generated = Seq("__lus", "__bin", "r_ts") ++ rightValCols.map(c => s"r_$c")
    val dup = generated.diff(generated.distinct).distinct
    require(dup.isEmpty, s"rangeJoin would emit duplicate column(s) ${dup.mkString(", ")}")
    val taken = (left.columns ++ keyCols).toSet
    val clash = generated.filter(taken)
    require(clash.isEmpty,
      s"rangeJoin reserves column name(s) ${clash.mkString(", ")}; rename the input column(s)")
    val lowerUs = lowerSec * 1000000L
    val upperUs = upperSec * 1000000L
    val w = upperUs - lowerUs
    // integer floor-division for non-negative epoch micros: subtracting the
    // pmod first makes the numerator an exact multiple of w, so the double
    // division is exact (both operands < 2^53) and the cast is lossless
    def bin(c: Column): Column = ((c - pmod(c, lit(w))) / lit(w)).cast("long")
    // unix_micros requires the session-zoned TIMESTAMP type; inputs may
    // arrive as TIMESTAMP_NTZ (e.g. parquet micros written without UTC
    // adjustment). The cast is a no-op on TIMESTAMP and, with the session TZ
    // pinned UTC, lossless on NTZ — same wall-clock instants either way.
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    val l = left
      .withColumn("__lus", micros(col(leftTs)))
      .withColumn("__bin", explode(array_distinct(array(
        bin(col("__lus") + lit(lowerUs)), bin(col("__lus") + lit(upperUs))))))
    val r = right.select(keyCols.map(col) ++ Seq(
        col(rightTs).as("r_ts"),
        bin(micros(col(rightTs))).as("__bin")) ++
        rightValCols.map(c => col(c).as(s"r_$c")): _*)
    l.join(r, keyCols :+ "__bin")
      .filter(micros(col("r_ts")).between(
        col("__lus") + lit(lowerUs), col("__lus") + lit(upperUs)))
      .drop("__lus", "__bin")
  }
}
