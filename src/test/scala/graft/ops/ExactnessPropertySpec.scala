package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized exactness batteries for the operators whose pitch is
  * "sketch/delta speed, EXACT answers": heavy hitters (Misra-Gries
  * candidates + exact recount must equal the plain aggregate even on
  * adversarial near-uniform streams that starve the sketch) and
  * incremental aggregate/join maintenance (state + delta must equal a
  * full recompute for any random delta sequence). Fixed-fixture specs
  * pin shapes; these batteries cover the scenario space.
  */
class ExactnessPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def gen[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed)).get

  test("heavy hitters == plain aggregate over 25 random distributions") {
    (0 until 25).foreach { scenario =>
      // mix zipf-ish skew, uniform noise, and tiny domains — the
      // uniform case starves Misra-Gries and must trigger the exact
      // fallback rather than return a wrong set
      val spec = gen(for {
        nHot <- Gen.choose(0, 5)
        hotRep <- Gen.choose(50, 300)
        noise <- Gen.choose(100, 2000)
        domain <- Gen.choose(2, 400)
        k <- Gen.choose(1, 8)
        sketch <- Gen.oneOf(4, 64, 4096) // incl. adversarially tiny
      } yield (nHot, hotRep, noise, domain, k, sketch), scenario.toLong)
      val (nHot, hotRep, noise, domain, k, sketch) = spec
      val rnd = new scala.util.Random(scenario)
      val values = ((0 until nHot).flatMap(h => Seq.fill(hotRep)(s"hot_$h")) ++
        (0 until noise).map(_ => s"v_${rnd.nextInt(domain)}")).toList
      val ds = spark.createDataset(rnd.shuffle(values)).repartition(7)
      val got = HeavyHitters.topK(ds, k, sketchSize = sketch)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val expected = ds.toDF("value").groupBy("value").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("value").asc).limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === expected,
        s"scenario $scenario (sketch=$sketch k=$k domain=$domain)")
    }
  }

  test("incremental agg state + deltas == full recompute over 25 random sequences") {
    (0 until 25).foreach { scenario =>
      val rnd = new scala.util.Random(1000 + scenario)
      val nWaves = 1 + rnd.nextInt(4)
      val waves = (0 until nWaves).map { _ =>
        (0 until 50 + rnd.nextInt(200)).map(_ =>
          (s"g${rnd.nextInt(8)}", rnd.nextInt(1000) / 10.0))
      }
      var state = IncrementalAgg.partial(waves.head.toDF("g", "v"), Seq("g"), "v")
      waves.tail.foreach { w =>
        state = IncrementalAgg.merge(state,
          IncrementalAgg.partial(w.toDF("g", "v"), Seq("g"), "v"))
          .localCheckpoint(true)
      }
      val full = IncrementalAgg.partial(waves.flatten.toDF("g", "v"), Seq("g"), "v")
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toSet
      assert(snap(state) === snap(full), s"scenario $scenario diverged")
    }
  }

  test("incremental join maintenance == full re-join over 25 random deltas") {
    (0 until 25).foreach { scenario =>
      val rnd = new scala.util.Random(2000 + scenario)
      def table(n: Int, tag: String) =
        (0 until n).map(i => (rnd.nextInt(20).toLong, s"${tag}_$i"))
      val aOld = table(30 + rnd.nextInt(50), "a").toDF("k", "a_val")
      val bOld = table(30 + rnd.nextInt(50), "b").toDF("k", "b_val")
      val aDelta = table(rnd.nextInt(20), "da").toDF("k", "a_val")
      val bDelta = table(rnd.nextInt(20), "db").toDF("k", "b_val")
      val view = aOld.join(bOld, Seq("k"))
      val maintained = IncrementalJoin.maintain(view, aOld, aDelta, bOld, bDelta, Seq("k"))
      val full = aOld.unionByName(aDelta).join(bOld.unionByName(bDelta), Seq("k"))
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
      assert(snap(maintained) === snap(full), s"scenario $scenario diverged")
    }
  }
}
