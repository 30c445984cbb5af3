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
      "/root/testdata/sf0.1")

  test("stdout line fits the log-tail window at worst-case value widths") {
    // 999.99 is wider than any plausible per-query median (the slowest
    // query in any round to date is ~5 s); -1 is the failure sentinel
    for (v <- Seq(999.99, -1.0, 0.5)) {
      val line = worstCase(v)
      assert(line.length <= Bench.LineBudget,
        s"bench line ${line.length} chars at value $v — driver tail will truncate its head")
    }
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
