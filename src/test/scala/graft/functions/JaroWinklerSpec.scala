package graft.functions

import graft.SparkSpec
import graft.functions.JaroWinklerExpression.similarity
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic published values and DuckDB-pinned edge cases") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    // window 0 on equal-length-2 swaps: no matches at all
    assert(jw("ab", "ba") === 0.0)
    // integer-halved transpositions (3 mismatches -> t = 1); no common
    // prefix, so jw = jaro exactly
    assert(jw("abcdef", "bcadef") === 0.9444444444444445)
    // boost gated at jaro > 0.7: 5-char common prefix, no boost below
    assert(jw("prefix_same", "prefiy_diff") === 0.6969696969696969)
    // prefix capped at 4
    assert(jw("abcdefghij", "abcdefghix") === 0.96)
  }

  test("symmetry and bounds on arbitrary pairs") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === jw(b, a), s"asymmetric on '$a' / '$b'")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }
}
