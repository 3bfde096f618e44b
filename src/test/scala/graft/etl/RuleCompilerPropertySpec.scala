package graft.etl

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** pandas-semantics invariants over random rule lists (SURVEY.md §5.3):
  * output column set == successfully compiled rule names (first
  * occurrence order), row count always preserved, lookups never multiply
  * rows, compile never throws. Deterministic seeds (no scalatestplus
  * bridge in the offline cache). */
class RuleCompilerPropertySpec extends SparkTestBase {

  private lazy val mainDf = {
    import spark.implicits._
    Seq((1L, 10.0, "a", 1), (2L, 20.0, "b", 2), (3L, 30.0, "a", 3), (4L, 40.0, "c", 9))
      .toDF("id", "amount", "grp", "code")
  }
  private lazy val mapping = {
    import spark.implicits._
    Seq((1, "one"), (2, "two"), (1, "uno")).toDF("k", "v")
  }

  private val goodSources = Gen.oneOf("id", "amount", "grp", "code")
  private val anyName = Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(8))

  private val genRule: Gen[Rule] = Gen.frequency(
    4 -> (for { n <- anyName; s <- Gen.frequency(4 -> goodSources, 1 -> Gen.const("missing_col")) }
      yield DirectMap(n, s)),
    3 -> (for {
      n <- anyName
      c <- goodSources
      op <- Gen.oneOf(">", "<", ">=", "<=", "==", "!=")
      v <- Gen.choose(0, 50)
      broken <- Gen.frequency(5 -> false, 1 -> true)
    } yield Conditional(n, if (broken) s"(`$c` $op" else s"(`$c` $op $v)", "T", "F")),
    2 -> (for {
      n <- anyName
      m <- Gen.frequency(3 -> Gen.const("m"), 1 -> Gen.const("absent"))
    } yield Lookup(n, m, "code", "k", "v")))

  test("invariants hold for random rule lists") {
    val samples = (1 to 25).flatMap { i =>
      Gen.listOfN(6, genRule).apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(samples.size >= 20, "generator should produce most samples")
    samples.foreach { rules =>
      val r = RuleCompiler.run(mainDf, rules, Map("m" -> mapping))
      // 1. every rule either produced a column or an error
      val produced = r.output.columns.toSet
      val errored = r.errors.map(_.rule.name).toSet
      assert(rules.map(_.name).toSet.subsetOf(produced ++ errored))
      // 2. produced columns are exactly the successful rule names
      val successNames = rules.filterNot(x => r.errors.exists(_.rule eq x)).map(_.name).distinct
      assert(produced === successNames.toSet)
      // 3. row count preserved (lookups never multiply rows)
      assert(r.output.count() === 4)
    }
  }
}

