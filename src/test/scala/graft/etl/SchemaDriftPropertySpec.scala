package graft.etl

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Algebraic properties of the widening lattice. `widen` is a partial
  * least-upper-bound: where defined it must behave like one —
  * commutative, idempotent, absorbing both inputs losslessly — because
  * reconcileUnion folds it over batches in arrival order and the result
  * must not depend on which extract showed up first.
  */
class SchemaDriftPropertySpec extends SparkTestBase {

  private val atomGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, DateType, TimestampType, BooleanType)
  private val decimalGen: Gen[DataType] = for {
    p <- Gen.choose(1, 38)
    s <- Gen.choose(0, p)
  } yield DecimalType(p, s)
  private val typeGen: Gen[DataType] = Gen.frequency(2 -> atomGen, 1 -> decimalGen)

  private def sample(n: Int): Seq[(DataType, DataType)] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap { i =>
      for {
        a <- typeGen(params, Seed(i * 2 + 1)) // deterministic battery
        b <- typeGen(params, Seed(i * 2 + 2))
      } yield (a, b)
    }
  }

  test("widen is commutative and idempotent over a 500-pair battery") {
    sample(500).foreach { case (a, b) =>
      assert(SchemaDrift.widen(a, b) === SchemaDrift.widen(b, a), s"comm: $a vs $b")
      assert(SchemaDrift.widen(a, a) === Some(a), s"idem: $a")
    }
  }

  test("a defined decimal LUB represents every value of both inputs exactly") {
    sample(500).foreach {
      case (a: DecimalType, b: DecimalType) =>
        SchemaDrift.widen(a, b).foreach { w =>
          val wd = w.asInstanceOf[DecimalType]
          // lossless absorption: enough integral digits AND enough scale
          // for each input — the exact property whose violation silently
          // NULLed casts before the round-6 fail-loud fix
          Seq(a, b).foreach { t =>
            assert(wd.scale >= t.scale, s"$w drops scale of $t")
            assert(wd.precision - wd.scale >= t.precision - t.scale,
              s"$w drops integral digits of $t")
          }
        }
      case _ => ()
    }
  }

  test("widen result is stable under re-widening with either input (absorption)") {
    sample(500).foreach { case (a, b) =>
      SchemaDrift.widen(a, b).foreach { w =>
        assert(SchemaDrift.widen(w, a) === Some(w), s"absorb a: $a $b -> $w")
        assert(SchemaDrift.widen(w, b) === Some(w), s"absorb b: $a $b -> $w")
      }
    }
  }
}
