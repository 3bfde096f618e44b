package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property for the pipeline-spec codec: any rule list —
  * including names/expressions full of JSON metacharacters, quotes,
  * backslashes, newlines, unicode — must survive toJson → parse
  * exactly and without errors. The exported spec is the artifact users
  * move between deployments (and into the reference app, whose live
  * schema this is), so escaping defects would corrupt pipelines
  * silently.
  */
class RuleJsonPropertySpec extends AnyFunSuite {

  // strings biased toward escaping hazards
  private val nastyChar: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('"', '\\', '/', '\n', '\t', '\r', '{', '}', '[', ']', ':', ','),
    1 -> Gen.oneOf('é', '中', ' ', ' '),
    1 -> Gen.choose(' ', '~'))
  private val nastyStr: Gen[String] =
    Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, nastyChar).map(_.mkString))

  private val ruleGen: Gen[Rule] = Gen.oneOf(
    for { n <- nastyStr; s <- nastyStr } yield DirectMap(n, s),
    for { n <- nastyStr; e <- nastyStr; t <- nastyStr; el <- nastyStr }
      yield Conditional(n, e, t, el),
    for { n <- nastyStr; m <- nastyStr; i <- nastyStr; k <- nastyStr; v <- nastyStr }
      yield Lookup(n, m, i, k, v))

  test("toJson -> parse is the identity over a 300-list adversarial battery") {
    val params = Gen.Parameters.default
    (0 until 300).foreach { i =>
      val rules = (for {
        n <- Gen.choose(0, 6)
        rs <- Gen.listOfN(n, ruleGen)
      } yield rs)(params, Seed(i)).get
      val (parsed, errors) = RuleJson.parse(RuleJson.toJson(rules))
      assert(errors.isEmpty, s"seed $i: $errors")
      assert(parsed === rules, s"seed $i round-trip diverged")
    }
  }
}
