package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Vectors from the published Porter (1980) algorithm description. */
class PorterStemmerSpec extends AnyFunSuite {

  // q26's oracle maps tokens through a generated (token → stem) dictionary
  // over TextQueries.CorpusCleanVocab; an out-of-dictionary corpus token
  // would surface as a '??' sentinel hash failure at verify time. This pin
  // catches generator drift IN-round: every cleaned corpus token at the
  // spec and verify scales must be a dictionary word.
  test("q26 stem dictionary covers the corpus vocabulary") {
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val toks = graft.sources.Tables.documents(spark, dir)
        .select(explode(TextFns.cleanTokens(col("text"))).as("t"))
        .distinct().collect().map(_.getString(0)).toSet
      val missing = toks -- graft.operators.TextQueries.CorpusCleanVocab.toSet
      assert(missing.isEmpty,
        s"$dir has cleaned tokens outside the q26 dictionary: $missing")
    }
  }

  val vectors: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2-4 composites
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // composites / quirks
    "generalization" -> "gener", "argument" -> "argument",
    "connection" -> "connect", "connected" -> "connect", "connecting" -> "connect",
    "running" -> "run", "flies" -> "fli", "happiness" -> "happi")

  test("published Porter vectors") {
    val failures = vectors.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("short words and nulls pass through") {
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem("at") == "at")
    assert(PorterStemmer.stem("") == "")
    assert(PorterStemmer.stem(null) == null)
  }
}
