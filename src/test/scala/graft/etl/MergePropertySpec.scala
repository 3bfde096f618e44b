package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized invariant battery for the merge family. Each scenario
  * replays a random sequence of SCD2 update waves (changes, no-ops,
  * inserts, NULL transitions) and asserts the STRUCTURAL invariants any
  * consumer of a type-2 dimension relies on — exactly one open row per
  * key, per-key validity intervals that chain without gaps or overlaps,
  * closed rows immutable — plus a replay-consistency check (the open
  * slice equals the last written value per key) and upsert idempotence.
  * Fixed-fixture specs (MergeSpec) pin exact outputs; this battery
  * covers the scenario space.
  */
class MergePropertySpec extends SparkTestBase {
  import spark.implicits._

  private case class Wave(key: Long, value: Option[String], at: Long)

  private def waves(seed: Long): Seq[Seq[Wave]] = {
    val params = Gen.Parameters.default
    val valueGen = Gen.option(Gen.oneOf("a", "b", "c"))
    val g = for {
      nWaves <- Gen.choose(1, 4)
      waves <- Gen.listOfN(nWaves, for {
        nKeys <- Gen.choose(1, 6)
        keys <- Gen.pick(nKeys, 1L to 8L)
        vals <- Gen.listOfN(nKeys, valueGen)
      } yield keys.toSeq.zip(vals))
    } yield waves
    g(params, Seed(seed)).get.zipWithIndex.map { case (w, t) =>
      w.map { case (k, v) => Wave(k, v, 100L * (t + 1)) }
    }
  }

  test("scd2: structural invariants hold over a 40-scenario random battery") {
    (0 until 40).foreach { scenario =>
      var dim = Seq.empty[(Long, Option[String], Long, Option[Long])]
        .toDF("k", "attr", "valid_from", "valid_to")
      val lastWritten = scala.collection.mutable.Map.empty[Long, Option[String]]
      waves(scenario.toLong).foreach { wave =>
        val updates = wave.map(w => (w.key, w.value, w.at)).toDF("k", "attr", "valid_from")
        dim = Merge.scd2(dim, updates, keys = Seq("k"), trackedCols = Seq("attr"))
          .localCheckpoint(true) // flatten lineage across waves
        wave.foreach(w => lastWritten(w.key) = w.value)
      }
      val rows = dim.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      // exactly one open row per key, carrying the last written value
      val open = rows.filter(_._4.isEmpty)
      assert(open.groupBy(_._1).forall(_._2.length == 1),
        s"scenario $scenario: key with != 1 open row")
      open.foreach { case (k, v, _, _) =>
        assert(v === lastWritten(k), s"scenario $scenario: open row of $k stale")
      }
      assert(open.map(_._1).toSet === lastWritten.keySet)
      // per-key history chains: sorted intervals meet exactly (validTo
      // == next validFrom), no overlaps, no gaps, open row last
      rows.groupBy(_._1).foreach { case (k, hist) =>
        val sorted = hist.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Array((_, _, _, Some(to)), (_, _, from, _)) =>
            assert(to === from, s"scenario $scenario: key $k gap/overlap $to != $from")
          case Array((_, _, f1, None), (_, _, _, _)) =>
            fail(s"scenario $scenario: key $k open row at $f1 is not last")
          case _ => ()
        }
        // consecutive versions must differ in the tracked attribute
        sorted.sliding(2).foreach {
          case Array((_, v1, _, _), (_, v2, _, _)) =>
            assert(v1 !== v2, s"scenario $scenario: key $k no-op version recorded")
          case _ => ()
        }
      }
    }
  }

  test("upsert is idempotent over a 40-scenario random battery") {
    (0 until 40).foreach { scenario =>
      val base = (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
      val delta = waves(scenario.toLong).head
        .map(w => (w.key, w.value.getOrElse("z"))).toDF("k", "v")
      val once = Merge.upsert(base, delta, keys = Seq("k"))
      val twice = Merge.upsert(once, delta, keys = Seq("k"))
      val a = once.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val b = twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(a === b, s"scenario $scenario: upsert not idempotent")
      assert(a.size === once.count(), s"scenario $scenario: duplicate keys after upsert")
    }
  }
}
