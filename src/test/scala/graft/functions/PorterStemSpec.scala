package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Vectors from the published Porter (1980) paper examples and the
  * canonical voc/output test pairs distributed with the algorithm. */
class PorterStemSpec extends AnyFunSuite {

  private val vectors = Seq(
    // paper step examples
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    // electric* continue through step 4 (m("electr") = 2 drops "ic"):
    // the paper's "-> electric" lines illustrate step 3 alone
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // common-word sanity
    "running" -> "run", "organization" -> "organ", "organizations" -> "organ",
    "connected" -> "connect", "connecting" -> "connect", "connection" -> "connect",
    "argument" -> "argument", "arguments" -> "argument"
  )

  test("published Porter vectors stem exactly") {
    val bad = vectors.collect {
      case (in, want) if PorterStem.stem(in) != want =>
        s"$in -> ${PorterStem.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"mis-stemmed: ${bad.mkString(", ")}")
  }

  test("short words, non-alpha and already-stemmed forms pass through") {
    assert(PorterStem.stem("a") === "a")
    assert(PorterStem.stem("is") === "is")
    assert(PorterStem.stem("x9z") === "x9z")
    assert(PorterStem.stem("Hello") === "Hello") // caller must lowercase
    assert(PorterStem.stem("run") === "run")
  }

  // NOTE: Porter is deliberately NOT idempotent (stem("agre") = "agr"),
  // so no idempotence property is asserted — matching the published
  // algorithm exactly matters more than an aesthetically nice fixpoint.

  // ------------------------------------------------- second reference

  /** Independent transcription of Porter 1980, written against the
    * paper's rule list with a DIFFERENT structure than the production
    * expression: immutable Strings + a letter-form ("cv") string for
    * measure/conditions, explicit longest-match selection by suffix
    * length instead of ordered tables. Divergences adjudicate against
    * the paper: one rule per step, chosen by longest matching suffix,
    * condition tested after selection (no fallback to shorter rules). */
  private object RefPorter {
    private def cv(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val isV = "aeiou".contains(s.charAt(i)) ||
          (s.charAt(i) == 'y' && i > 0 && sb.charAt(i - 1) == 'c')
        sb.append(if (isV) 'v' else 'c'); i += 1
      }
      sb.toString
    }
    private def m(stem: String): Int = {
      val f = cv(stem)
      f.zip(f.drop(1)).count { case (a, b) => a == 'v' && b == 'c' }
    }
    private def hasVowel(stem: String): Boolean = cv(stem).contains('v')
    private def dblC(s: String): Boolean =
      s.length >= 2 && s.last == s(s.length - 2) && cv(s).last == 'c'
    private def cvcO(s: String): Boolean =
      s.length >= 3 && cv(s).takeRight(3) == "cvc" && !"wxy".contains(s.last)

    private val step2 = Seq("ational" -> "ate", "tional" -> "tion",
      "enci" -> "ence", "anci" -> "ance", "izer" -> "ize", "abli" -> "able",
      "alli" -> "al", "entli" -> "ent", "eli" -> "e", "ousli" -> "ous",
      "ization" -> "ize", "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
      "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
      "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    private val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    private val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
      "ant", "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
      "ous", "ive", "ize")

    def stem(word: String): String = {
      if (word.length <= 2 || !word.forall(c => c >= 'a' && c <= 'z')) return word
      var w = word

      def longest(table: Seq[(String, String)], cond: String => Boolean): Unit = {
        val hits = table.filter { case (suf, _) => w.endsWith(suf) }
        if (hits.nonEmpty) {
          val (suf, rep) = hits.maxBy(_._1.length)
          val stem = w.dropRight(suf.length)
          if (cond(stem)) w = stem + rep
        }
      }

      longest(Seq("sses" -> "ss", "ies" -> "i", "ss" -> "ss", "s" -> ""), _ => true)

      if (w.endsWith("eed")) {
        if (m(w.dropRight(3)) > 0) w = w.dropRight(1)
      } else {
        val stripped =
          if (w.endsWith("ed") && hasVowel(w.dropRight(2))) { w = w.dropRight(2); true }
          else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) { w = w.dropRight(3); true }
          else false
        if (stripped) {
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (dblC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
          else if (m(w) == 1 && cvcO(w)) w += "e"
        }
      }

      if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

      longest(step2, s => m(s) > 0)
      longest(step3, s => m(s) > 0)

      val hits4 = step4.filter(w.endsWith)
      if (hits4.nonEmpty) {
        val suf = hits4.maxBy(_.length)
        val stem = w.dropRight(suf.length)
        if (m(stem) > 1 &&
            (suf != "ion" || stem.endsWith("s") || stem.endsWith("t"))) w = stem
      }

      if (w.endsWith("e")) {
        val stem = w.dropRight(1)
        val mm = m(stem)
        if (mm > 1 || (mm == 1 && !cvcO(stem))) w = stem
      }
      if (m(w) > 1 && dblC(w) && w.endsWith("l")) w = w.dropRight(1)
      w
    }
  }

  test("differential fuzz: exhaustive short words vs the independent transcription") {
    // Every word of length 3-5 over a suffix-heavy alphabet: ~42k
    // words covering m-measure boundaries, y-as-vowel flips, double
    // consonants and cvc codas that the published vectors never reach.
    val alpha = "aestionl".toVector
    def words(len: Int): Iterator[String] =
      Iterator.fill(len)(alpha).foldLeft(Iterator("")) { (acc, cs) =>
        acc.flatMap(p => cs.iterator.map(c => p + c))
      }
    var n = 0
    (3 to 5).foreach { len =>
      words(len).foreach { word =>
        val got = PorterStem.stem(word)
        val want = RefPorter.stem(word)
        assert(got === want, s"'$word': native '$got' vs reference '$want'")
        n += 1
      }
    }
    assert(n === 512 + 4096 + 32768)
  }

  test("differential fuzz: seeded suffix-stacked words vs the independent transcription") {
    // Random stems with stacked Porter-relevant suffixes: probes step
    // interactions (1b recoding into step-2 territory, 4-then-5 chains,
    // double consonants before 5b) on realistic word shapes.
    val suffixes = Seq("ational", "ization", "fulness", "iveness", "biliti",
      "icate", "ative", "alize", "ement", "ation", "sses", "ies", "eed",
      "ing", "ed", "ion", "iti", "ous", "ful", "ness", "alli", "entli",
      "ll", "y", "e", "s", "")
    val rnd = new scala.util.Random(1980)
    val letters = "abcdefghijklmnopqrstuvwyz"
    (0 until 30000).foreach { i =>
      val stemLen = 1 + rnd.nextInt(6)
      val base = (0 until stemLen).map(_ => letters(rnd.nextInt(letters.length))).mkString
      val word = base + suffixes(rnd.nextInt(suffixes.length)) +
        (if (rnd.nextBoolean()) suffixes(rnd.nextInt(suffixes.length)) else "")
      val got = PorterStem.stem(word)
      val want = RefPorter.stem(word)
      assert(got === want, s"case $i '$word': native '$got' vs reference '$want'")
    }
  }
}
