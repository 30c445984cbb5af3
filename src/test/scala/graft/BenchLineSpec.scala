package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap

/** Guards the driver-contract bench stdout line. The driver tail-captures
  * the last 2000 chars of the build log; four straight rounds of
  * `parsed:null` traced to the line's HEAD falling off the front of that
  * window. This pins the line's budget against the FULL current query set
  * at worst-case value widths, so adding queries re-breaks the build here
  * instead of silently blinding the driver's bench gate again.
  */
class BenchLineSpec extends AnyFunSuite {

  private def worstCase(v: Double): String =
    Bench.stdoutLine(
      ListMap(SparkEntry.queries.keys.map(_ -> v).toSeq: _*),
      "/root/testdata/sf0.1", cpar = 999.99)

  test("stdout line fits the log-tail window at worst-case value widths") {
    // 999.99 is wider than any plausible per-query median (the slowest
    // query in any round to date is ~5 s); -1 is the failure sentinel.
    // The empty-query-map final rung guarantees the fit at ANY width and
    // query count; the second loop pins that every width a real round
    // could produce still ships the FULL per-query map.
    for (v <- Seq(999.99, -1.0, 0.5)) {
      val line = worstCase(v)
      assert(line.length <= Bench.LineBudget,
        s"bench line ${line.length} chars at value $v — driver tail will truncate its head")
    }
    for (v <- Seq(99.99, 9.99, 0.5)) {
      val line = worstCase(v)
      assert(!line.contains("\"queries\":{}"),
        s"value width $v must not need the empty-map rung")
      assert(line.length <= Bench.LineBudget)
    }
    // the catastrophic all-fail round: the failed-array rung must name
    // EVERY query on the driver channel (sentinels are never anonymous),
    // parse as JSON, and still fit
    val allFail = worstCase(-1.0)
    assert(allFail.length <= Bench.LineBudget)
    val parsedFail = org.json4s.jackson.JsonMethods.parse(allFail)
    val failedNames = (parsedFail \ "failed").asInstanceOf[org.json4s.JArray]
      .arr.map(_.asInstanceOf[org.json4s.JString].s).toSet
    val wantNames = SparkEntry.queries.keys
      .map(_.takeWhile(_ != '_').stripPrefix("q")).toSet
    assert(failedNames == wantNames,
      s"every failing query must stay named: missing ${wantNames -- failedNames}")
  }

  test("stdout line is valid JSON with every query present") {
    val line = worstCase(1.0)
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val queries = (parsed \ "queries").asInstanceOf[org.json4s.JObject].obj
    assert(queries.size == SparkEntry.queries.size,
      "every query key must survive into the stdout line")
    // qNN prefixes must stay unique or two queries silently merge into one
    // JSON key (and the driver's per-query diff reads the wrong number)
    val prefixes = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN prefixes: ${prefixes.diff(prefixes.distinct).distinct.mkString(", ")}")
  }

  test("stdout line carries the cpar contamination indicator") {
    val line = worstCase(1.0)
    assert(line.contains("\"cpar\":999.99"),
      "the parallel-canary field must survive into the driver-captured line")
  }

  test("canary normalization rejects a polluted pass the median would inherit") {
    // r15's actual q47 shape: clean 0.77 s, catastrophically polluted pass
    // (16.04, contamination onset mid-pass so only its TRAILING bracket
    // reads hot), half-polluted pass (8.84, both brackets hot). Plain
    // median-of-3 reports 8.84; with min-bracket ratios pass 3 corrects
    // (ratio 10) and the median lands between the clean figure and the
    // corrected one.
    val passes = Seq(Map("q47" -> 0.77), Map("q47" -> 16.04), Map("q47" -> 8.84))
    val canaries = Seq(0.7, 0.7, 14.0, 7.0) // pass2 min(0.7,14)=0.7, pass3 min(14,7)=7 -> ratio 10
    val m = Bench.canaryNormalizedMedians(Seq("q47"), passes, canaries)
    assert(m("q47") < 2.1,
      s"normalized median ${m("q47")} should land near the clean 0.77 s, not the polluted 8.84")
    // a spike that hits ONLY a canary window must not deflate a clean pass:
    // pass 2 is genuinely 5.0 s but its leading bracket read 5.6 s
    val guarded = Bench.canaryNormalizedMedians(Seq("q1"),
      Seq(Map("q1" -> 5.0), Map("q1" -> 5.0), Map("q1" -> 5.0)), Seq(0.7, 5.6, 0.7, 0.7))
    assert(math.abs(guarded("q1") - 5.0) < 1e-9,
      s"bracket-only spike deflated a clean pass: ${guarded("q1")}")
    // a clean run is a no-op: ratios 1, plain median preserved
    val clean = Bench.canaryNormalizedMedians(Seq("q1"),
      Seq(Map("q1" -> 1.0), Map("q1" -> 1.2), Map("q1" -> 1.1)), Seq(0.7, 0.7, 0.7, 0.7))
    assert(math.abs(clean("q1") - 1.1) < 1e-9)
    // failure sentinel survives un-normalized
    val failed = Bench.canaryNormalizedMedians(Seq("q1"),
      Seq(Map("q1" -> 1.0), Map("q1" -> -1.0), Map("q1" -> 1.1)), Seq(0.7, 0.7, 0.7, 0.7))
    assert(failed("q1") == -1.0)
  }

  test("clean-bracket >3x spread takes the two-smallest mean, marked (r16 blind spot, ADVICE r17)") {
    // r16's actual q140 shape: contamination fell entirely BETWEEN canary
    // windows, so every bracket read clean ~0.7 s while two passes carried
    // polluted samples — the median can only pick a polluted one. The
    // estimator is the MEAN OF THE TWO SMALLEST (not the bare min, which
    // would systematically report the best case of any high-variance
    // query), and the switch is visible in the markers.
    val (q140, m140) = Bench.canaryNormalizedMediansMarked(Seq("q140"),
      Seq(Map("q140" -> 15.6), Map("q140" -> 1.25), Map("q140" -> 4.93)),
      Seq(0.78, 0.69, 0.99, 0.79))
    // every bracket sits inside the sub-1.75× noise floor (r20: ratios
    // that small are idle-host canary noise, not contamination), so the
    // samples reach the two-smallest mean UN-rescaled
    val expected = (1.25 + 4.93) / 2
    assert(math.abs(q140("q140") - expected) < 1e-9,
      s"clean-bracket 12x spread must report the two-smallest mean $expected, got ${q140("q140")}")
    assert(m140 == Seq("q140"), s"estimator switch must be marked, got $m140")
    // same signature from the other cause: the first timed pass at a fresh
    // warehouse pays q76's one-time bucketed-layout write
    val q76 = Bench.canaryNormalizedMedians(Seq("q76"),
      Seq(Map("q76" -> 2.62), Map("q76" -> 0.31), Map("q76" -> 0.19)),
      Seq(0.7, 0.7, 0.7, 0.7))
    assert(math.abs(q76("q76") - (0.19 + 0.31) / 2) < 1e-9)
    // an exact-0.0 sample must not win outright (ADVICE r17): it averages
    // with the second-smallest instead
    val zero = Bench.canaryNormalizedMedians(Seq("q1"),
      Seq(Map("q1" -> 0.0), Map("q1" -> 0.4), Map("q1" -> 0.5)), Seq(0.7, 0.7, 0.7, 0.7))
    assert(math.abs(zero("q1") - 0.2) < 1e-9)
    // sub-3x spread stays a median: ordinary noise must not switch estimator
    val (noisy, mNoisy) = Bench.canaryNormalizedMediansMarked(Seq("q1"),
      Seq(Map("q1" -> 1.0), Map("q1" -> 2.0), Map("q1" -> 1.5)), Seq(0.7, 0.7, 0.7, 0.7))
    assert(math.abs(noisy("q1") - 1.5) < 1e-9 && mNoisy.isEmpty)
    // dirty brackets keep the median too: after a real correction the min
    // could be the over-corrected sample
    val dirty = Bench.canaryNormalizedMedians(Seq("q1"),
      Seq(Map("q1" -> 1.0), Map("q1" -> 40.0), Map("q1" -> 1.0)), Seq(0.7, 7.0, 7.0, 0.7))
    assert(math.abs(dirty("q1") - 1.0) < 1e-9,
      s"pass-2 ratio 10 corrects 40.0 -> 4.0; median of [1,4,1] is 1, got ${dirty("q1")}")
  }

  test("segment estimator attributes a mid-pass dip to its segment only (r19 failure mode)") {
    // r19's driver artifact: q123 read 20.6 s (true ~3.5 s) because a
    // contention dip sat INSIDE a pass where whole-pass brackets (min of
    // first/last canary) read clean. With interleaved canaries the dip's
    // segment shows hot brackets and ONLY that segment's queries are
    // corrected; the clean segment's queries are untouched.
    def rec(a: Double, b: Double, cs: Seq[Double]) =
      Bench.PassRecord(Map("qa" -> a, "qb" -> b), cs, Map("qa" -> 0, "qb" -> 1))
    val passes = Seq(
      rec(1.0, 1.0, Seq(0.7, 0.7, 0.7)),
      rec(1.0, 4.0, Seq(0.7, 2.8, 2.8)), // seg-1 contaminated: ratio 4
      rec(1.0, 1.0, Seq(0.7, 0.7, 0.7)))
    val (est, minRule, suspects) = Bench.segmentEstimates(Seq("qa", "qb"), passes)
    assert(math.abs(est("qa") - 1.0) < 1e-9, s"clean segment's query moved: ${est("qa")}")
    assert(math.abs(est("qb") - 1.0) < 1e-9,
      s"contaminated segment's 4.0 must normalize to 1.0 before the median: ${est("qb")}")
    assert(minRule.isEmpty && suspects.isEmpty)
    // the OLD whole-pass view of the same run (brackets = pass ends only)
    // reads clean and lets the polluted median through — the regression
    // this estimator exists to kill
    val old = Bench.canaryNormalizedMedians(Seq("qb"),
      Seq(Map("qb" -> 1.0), Map("qb" -> 4.0), Map("qb" -> 1.0)), Seq(0.7, 0.7, 0.7, 0.7))
    assert(math.abs(old("qb") - 1.0) < 1e-9, "sanity: median-of-3 survives one outlier")
  }

  test("post-pass re-measure out-votes a twice-contaminated query") {
    // contamination inside one segment window on TWO passes leaves clean
    // brackets and spread > 3x: the first call flags the suspect, the
    // re-measure mini-pass contributes a 4th independent sample, and the
    // two-smallest mean then reads the clean figure.
    def rec(v: Double) =
      Bench.PassRecord(Map("q" -> v), Seq(0.7, 0.7), Map("q" -> 0))
    val base = Seq(rec(8.0), rec(1.0), rec(7.5))
    val (_, _, suspects) = Bench.segmentEstimates(Seq("q"), base)
    assert(suspects == Seq("q"), s"spread 8x must be flagged for re-measure, got $suspects")
    // a centisecond query 3x-spreading from noise must NOT burn a
    // re-measure slot (the min_rule estimator still covers it)
    val tiny = Seq(rec(0.08), rec(0.01), rec(0.07))
    val (estT, minRuleT, suspectsT) = Bench.segmentEstimates(Seq("q"), tiny)
    assert(suspectsT.isEmpty, s"immaterial spread re-measured: $suspectsT")
    assert(minRuleT == Seq("q") && math.abs(estT("q") - (0.01 + 0.07) / 2) < 1e-9)
    val (est, minRule, _) =
      Bench.segmentEstimates(Seq("q"), base :+ rec(1.1))
    assert(math.abs(est("q") - (1.0 + 1.1) / 2) < 1e-9,
      s"4-sample two-smallest mean should read ~1.05, got ${est("q")}")
    assert(minRule == Seq("q"))
    // dirty-bracket spread: the median rules, but the 4th sample still
    // moves it off the contaminated tail (lower median of 4 = 2nd smallest)
    def hot(v: Double, c: Double) =
      Bench.PassRecord(Map("q" -> v), Seq(c, c), Map("q" -> 0))
    val dirty = Seq(hot(1.0, 0.7), hot(12.0, 2.8), hot(9.0, 0.7))
    val (estD, _, suspectsD) = Bench.segmentEstimates(Seq("q"), dirty)
    assert(suspectsD == Seq("q"))
    val (estD4, _, _) = Bench.segmentEstimates(Seq("q"), dirty :+ hot(1.1, 0.7))
    assert(estD4("q") < estD("q") + 1e-9 && math.abs(estD4("q") - 1.1) < 1e-9,
      s"4th sample must pull the dirty-bracket estimate to the 2nd smallest: ${estD4("q")}")
    // a key absent from every pass (defensive) reports the failure sentinel
    val (estM, _, _) = Bench.segmentEstimates(Seq("q", "ghost"), base :+ rec(1.1))
    assert(estM("ghost") == -1.0)
    // failure sentinel in any pass propagates regardless of other samples
    val (estF, _, _) = Bench.segmentEstimates(Seq("q"), Seq(rec(1.0), rec(-1.0), rec(1.0)))
    assert(estF("q") == -1.0)
  }

  test("realistic mixed-cost round keeps >=0.1s resolution for every query >=0.5s") {
    // the r17 failure: at 180 queries the ladder coarsened EVERY value to
    // whole seconds (131/180 printed 0 or 1). The rest-fold rungs must
    // instead fold the cheap tail and keep deciseconds on the costly head.
    val costs = Seq(0.02, 0.04, 0.11, 0.31, 0.72, 1.43, 3.35, 0.09)
    val results = ListMap(SparkEntry.queries.keys.zipWithIndex.map {
      case (k, i) => k -> costs(i % costs.size)
    }.toSeq: _*)
    val line = Bench.stdoutLine(results, "/root/testdata/sf0.1", cpar = 0.71)
    assert(line.length <= Bench.LineBudget)
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val qmap = (parsed \ "queries").asInstanceOf[org.json4s.JObject].obj.toMap
    results.foreach { case (k, v) =>
      if (v >= 0.5) {
        val short = k.takeWhile(_ != '_')
        val got = qmap(short) match {
          case org.json4s.JDouble(d) => d
          case org.json4s.JInt(n) => n.toDouble
          case other => fail(s"unexpected JSON value for $short: $other")
        }
        assert(math.abs(got - v) <= 0.05 + 1e-9,
          s"$short: $v rendered as $got — lost sub-second resolution")
      }
    }
    // the folded tail is present and the total is preserved
    assert(qmap.contains("rest"), "cheap-tail fold entry missing")
    assert(line.contains("\"rest_n\":"))
    val total = (parsed \ "value").asInstanceOf[org.json4s.JDouble].num
    assert(math.abs(total - results.values.sum) < 0.01)
    // a failure sentinel must never be folded into rest
    val withFail = Bench.stdoutLine(results.updated(results.keys.head, -1.0),
      "/root/testdata/sf0.1", cpar = 0.71)
    assert(withFail.contains("\"" + results.keys.head.takeWhile(_ != '_') + "\":-1"))
  }

  test("value_norm appears only under sustained (median-canary) contention") {
    val results = ListMap(SparkEntry.queries.keys.map(_ -> 0.5).toSeq: _*)
    // clean run: median canary at the anchor — no correction field, even
    // with ONE hot canary window driving cpar past the threshold (the
    // false-positive a max-based rule produced on a clean r21 run)
    val clean = Bench.stdoutLine(results, "/root/testdata/sf0.1",
      cpar = 1.16, cparMed = 0.68)
    assert(!clean.contains("value_norm"), s"clean run must not self-correct: $clean")
    assert(clean.length <= Bench.LineBudget)
    // sustained contention: median canary well past the threshold — the
    // line carries value_norm = value × clean/median beside the raw value
    val hot = Bench.stdoutLine(results, "/root/testdata/sf0.1",
      cpar = 1.35, cparMed = 1.20)
    assert(hot.length <= Bench.LineBudget)
    def num(v: org.json4s.JValue): Double = v match {
      case org.json4s.JDouble(d) => d
      case org.json4s.JInt(n) => n.toDouble
      case other => fail(s"unexpected JSON number: $other")
    }
    val parsed = org.json4s.jackson.JsonMethods.parse(hot)
    val raw = num(parsed \ "value")
    val norm = num(parsed \ "value_norm")
    assert(math.abs(raw - results.values.sum) < 0.01)
    assert(math.abs(norm - raw * Bench.CleanCanaryPar / 1.20) < 0.01,
      s"value_norm must apply the canary rule: raw=$raw norm=$norm")
  }

  test("values render compactly and parse back to the same number") {
    val line = Bench.stdoutLine(
      ListMap("q01_x" -> 0.5, "q02_y" -> 1.0, "q03_z" -> -1.0, "q04_w" -> 12.34),
      "sfdir")
    assert(line.contains("\"q01\":0.5") && line.contains("\"q02\":1") &&
      line.contains("\"q03\":-1") && line.contains("\"q04\":12.34"))
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val total = (parsed \ "value").asInstanceOf[org.json4s.JDouble].num
    assert(math.abs(total - 12.84) < 1e-9)
  }
}
