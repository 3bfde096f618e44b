package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized differential batteries for the round-13 operator
  * families: every mergeable/streaming face must equal its one-shot
  * operator on arbitrary random inputs and arbitrary time-ordered
  * splits (hand-fixture specs pin the shapes; these sweep the scenario
  * space), and the sweep/quantile operators must equal brute-force
  * Scala references computed with BigInt/boolean-array arithmetic.
  */
class Round13PropertySpec extends SparkTestBase {
  import spark.implicits._

  test("coverage == boolean-array brute force over 12 random event sets") {
    (0 until 12).foreach { scenario =>
      val rnd = new scala.util.Random(1000 + scenario)
      val len = 1 + rnd.nextInt(20)
      val rows = (0 until 5 + rnd.nextInt(120)).map { _ =>
        (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong)
      }
      val df = rows.map { case (u, sec) => (u, sec * 1000000000L) }
        .toDF("user_id", "ts")
      val got = graft.ext.Events.coverage(df, "user_id", len.toLong)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
      rows.groupBy(_._1).foreach { case (u, evs) =>
        val covered = Array.fill(300)(false)
        evs.foreach { case (_, s) =>
          (s.toInt until (s.toInt + len)).foreach(covered(_) = true) }
        val lo = evs.map(_._2).min.toInt
        val hi = evs.map(_._2).max.toInt + len
        val cov = covered.count(identity)
        var islands = 0
        (0 until 300).foreach { i =>
          if (covered(i) && (i == 0 || !covered(i - 1))) islands += 1 }
        val (n, ni, c, span, gap) = got(u)
        assert(n === evs.size.toLong, s"scenario $scenario user $u n")
        assert(ni === islands.toLong, s"scenario $scenario user $u islands")
        assert(c === cov.toLong, s"scenario $scenario user $u covered")
        assert(span === (hi - lo).toLong && gap === (hi - lo - cov).toLong,
          s"scenario $scenario user $u span/gap")
      }
    }
  }

  test("coverage gate fold == one-shot over 8 random time-ordered splits") {
    (0 until 8).foreach { scenario =>
      val rnd = new scala.util.Random(2000 + scenario)
      val rows = (0 until 20 + rnd.nextInt(80)).map { _ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong)
      }.sortBy(_._2)
      val cuts = Seq(rows.size / 3, 2 * rows.size / 3)
      val batches = Seq(rows.take(cuts(0)),
        rows.slice(cuts(0), cuts(1)), rows.drop(cuts(1)))
        .filter(_.nonEmpty)
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"covprop_$scenario").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        val df = b.map { case (u, s) => (u, s * 1000000000L) }
          .toDF("user_id", "ts")
        graft.streaming.StreamingOps
          .applyCoverageBatch(df, i.toLong, "user_id", 7L, stateDir)
      }
      val gate = graft.streaming.StreamingOps
        .coverageGateResult(spark, stateDir)
        .orderBy("key").collect().map(_.toSeq)
      val all = rows.map { case (u, s) => (u, s * 1000000000L) }
        .toDF("user_id", "ts")
      val direct = graft.ext.Events.coverage(all, "user_id", 7L)
        .orderBy("user_id").collect().map(_.toSeq)
      assert(gate.toSeq === direct.toSeq, s"scenario $scenario")
    }
  }

  test("twap gate fold == one-shot over 8 random time-ordered splits") {
    (0 until 8).foreach { scenario =>
      val rnd = new scala.util.Random(3000 + scenario)
      val rows = (0 until 10 + rnd.nextInt(60)).map { i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong,
          (rnd.nextInt(2000) - 1000) / 10.0) // negative values too
      }.sortBy(r => (r._2, r._3))
      val cuts = Seq(rows.size / 3, 2 * rows.size / 3)
      val batches = Seq(rows.take(cuts(0)),
        rows.slice(cuts(0), cuts(1)), rows.drop(cuts(1)))
        .filter(_.nonEmpty)
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"twapprop_$scenario").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        val df = b.map { case (u, s, id, v) =>
          (u, new java.sql.Timestamp(s * 1000L), id, v) }
          .toDF("k", "t", "id", "v")
        graft.streaming.StreamingOps
          .applyTwapBatch(df, i.toLong, "k", "t", "id", "v", stateDir)
      }
      val gate = graft.streaming.StreamingOps.twapGateResult(spark, stateDir)
        .orderBy("key").collect().map(_.toSeq)
      val all = rows.map { case (u, s, id, v) =>
        (u, new java.sql.Timestamp(s * 1000L), id, v) }
        .toDF("k", "t", "id", "v")
      val direct = TimeSeries.twap(all, "k", "t", "id", "v")
        .orderBy("key").collect().map(_.toSeq)
      assert(gate.toSeq === direct.toSeq, s"scenario $scenario")
    }
  }

  test("weighted quantile == BigInt brute force over 12 random mixes") {
    (0 until 12).foreach { scenario =>
      val rnd = new scala.util.Random(4000 + scenario)
      val pMicro = Seq(100000L, 250000L, 500000L, 900000L)(rnd.nextInt(4))
      val rows = (0 until 5 + rnd.nextInt(80)).map { _ =>
        ("g", rnd.nextInt(20).toDouble, (1 + rnd.nextInt(1000)) / 4.0)
      }
      val df = rows.toDF("k", "v", "w")
      val got = Relational
        .weightedQuantilePerGroup(df, "k", "v", "w", pMicro).head()
      // brute force: pool exact micro weights per distinct value
      val pooled = rows.groupBy(_._2).view
        .mapValues(_.map(r => BigInt(math.round(r._3 * 1e6))).sum)
        .toSeq.sortBy(_._1)
      val tot = pooled.map(_._2).sum
      var cum = BigInt(0)
      val expected = pooled.collectFirst {
        case (v, w) if { cum += w; cum * 1000000 >= tot * pMicro } => v
      }.get
      assert(got.getDouble(1) === expected, s"scenario $scenario p=$pMicro")
      assert(BigInt(got.getLong(2)) === tot, s"scenario $scenario total")
    }
  }

  test("ohlc split-state merges == one-shot over 10 random partitions") {
    (0 until 10).foreach { scenario =>
      val rnd = new scala.util.Random(5000 + scenario)
      val rows = (0 until 10 + rnd.nextInt(60)).map { i =>
        (s"k${rnd.nextInt(3)}",
          new java.sql.Timestamp((86400L + rnd.nextInt(7200)) * 1000L),
          i.toLong, rnd.nextInt(1000) / 7.0)
      }
      val df = rows.toDF("k", "t", "id", "v")
      // random 3-way split — ohlc state is a pure monoid, ANY split works
      val tag = pmod(col("id") * 2654435761L, lit(3L))
      val states = (0 until 3).map(i =>
        TimeSeries.ohlcState(df.filter(tag === i), "k", "t", "id", "v"))
      val merged = TimeSeries.ohlcFromState(
        TimeSeries.mergeOhlcStates(states.reduce(_ unionByName _)))
        .orderBy("key", "window_start").collect().map(_.toSeq)
      val direct = TimeSeries.ohlcBars(df, "k", "t", "id", "v")
        .orderBy("key", "window_start").collect().map(_.toSeq)
      assert(merged.toSeq === direct.toSeq, s"scenario $scenario")
    }
  }

  test("cuped preserves the metric mean to within per-row rounding") {
    (0 until 6).foreach { scenario =>
      val rnd = new scala.util.Random(6000 + scenario)
      val rows = (0 until 20 + rnd.nextInt(100)).map { i =>
        val x = rnd.nextInt(1000) / 3.0
        (i.toLong, x, x * 2 + rnd.nextInt(100) / 7.0)
      }
      val df = rows.toDF("id", "x", "y")
      val got = Experiment.cuped(df, "y", "x")
        .agg(sum("y_adj_micro"), count(lit(1))).head()
      val sumY = rows.map(r => BigInt(math.round(r._3 * 1e6))).sum
      // Σ y_adj = Σ y − θ·Σ(x−x̄) = Σ y exactly; per-row rounding
      // leaves at most half a micro per row of drift
      val drift = (BigInt(got.getLong(0)) - sumY).abs
      assert(drift <= got.getLong(1),
        s"scenario $scenario drift $drift over ${got.getLong(1)} rows")
    }
  }
}
