package graft.functions

/** Porter stemming algorithm (M.F. Porter, 1980, "An algorithm for suffix
  * stripping" — public-domain algorithm, implemented from the published spec).
  *
  * Replaces the reference's NLTK `PorterStemmer().stem(word)` call
  * (reference: src/main.py:44,60). NLTK ships Porter with NLTK-specific
  * extensions; this is the classic published algorithm — a documented
  * deviation (SURVEY.md §2.4 T5).
  *
  * Pure function on strings: safe to call from codegen'd expressions and
  * executor-side lambdas alike; no shared state.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null) return null
    if (word.length <= 2) return word
    var b = word
    b = step1a(b); b = step1b(b); b = step1c(b)
    b = step2(b); b = step3(b); b = step4(b)
    b = step5a(b); b = step5b(b)
    b
  }

  private def isConsonant(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(s, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in the [C](VC)^m[V] form of the stem. */
  private def measure(s: String): Int = {
    var m = 0; var i = 0; val n = s.length
    while (i < n && isConsonant(s, i)) i += 1
    while (i < n) {
      while (i < n && !isConsonant(s, i)) i += 1
      if (i < n) { m += 1; while (i < n && isConsonant(s, i)) i += 1 }
    }
    m
  }

  private def containsVowel(s: String): Boolean =
    (0 until s.length).exists(i => !isConsonant(s, i))

  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isConsonant(s, s.length - 1)

  /** *o — stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && isConsonant(s, n - 3) && !isConsonant(s, n - 2) && isConsonant(s, n - 1) &&
      { val c = s.charAt(n - 1); c != 'w' && c != 'x' && c != 'y' }
  }

  private def replaceSuffix(s: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (s.endsWith(suffix)) {
      val stem = s.substring(0, s.length - suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(s)
    } else None

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed")) {
      if (measure(s.dropRight(3)) > 0) s.dropRight(1) else s
    } else {
      val stripped =
        if (s.endsWith("ed") && containsVowel(s.dropRight(2))) Some(s.dropRight(2))
        else if (s.endsWith("ing") && containsVowel(s.dropRight(3))) Some(s.dropRight(3))
        else None
      stripped match {
        case None => s
        case Some(t) =>
          if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
          else if (endsDoubleC(t) && !Set('l', 's', 'z').contains(t.last)) t.dropRight(1)
          else if (measure(t) == 1 && endsCvc(t)) t + "e"
          else t
      }
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && containsVowel(s.dropRight(1))) s.dropRight(1) + "i" else s

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(s: String): String =
    step2Rules.collectFirst { case (suf, rep) if s.endsWith(suf) =>
      replaceSuffix(s, suf, rep, 0).get
    }.getOrElse(s)

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(s: String): String =
    step3Rules.collectFirst { case (suf, rep) if s.endsWith(suf) =>
      replaceSuffix(s, suf, rep, 0).get
    }.getOrElse(s)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(s: String): String = {
    // "ion" only strips after s or t
    if (s.endsWith("ion") && s.length > 3 &&
        (s.charAt(s.length - 4) == 's' || s.charAt(s.length - 4) == 't') &&
        measure(s.dropRight(3)) > 1) return s.dropRight(3)
    step4Suffixes.collectFirst { case suf if s.endsWith(suf) =>
      val stem = s.substring(0, s.length - suf.length)
      if (measure(stem) > 1) stem else s
    }.getOrElse(s)
  }

  private def step5a(s: String): String =
    if (s.endsWith("e")) {
      val stem = s.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else s
    } else s

  private def step5b(s: String): String =
    if (s.endsWith("ll") && measure(s) > 1) s.dropRight(1) else s
}
