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
}
