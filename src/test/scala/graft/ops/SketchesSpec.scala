package graft.ops

import org.apache.datasketches.kll.KllDoublesSketch

import graft.SparkTestBase

/** Batteries for the mergeable sketch operators. The pitch under test:
  * exact answers below retention capacity (pinned by brute-force
  * equality on randomized fixtures, across partitionings), and
  * published-bound accuracy above it (pinned against the libraries'
  * own error guarantees on adversarial inputs).
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- theta

  test("theta overlap == brute-force set algebra in exact mode, any partitioning") {
    (0 until 10).foreach { scenario =>
      val rnd = new scala.util.Random(42 + scenario)
      val nSeg = 2 + rnd.nextInt(4)
      val rows = (0 until 500 + rnd.nextInt(1500)).map { _ =>
        (s"seg_${rnd.nextInt(nSeg)}", rnd.nextInt(300).toLong)
      }
      val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = (for {
        a <- truth.keys; b <- truth.keys if a < b
      } yield (a, b, truth(a).size.toLong, truth(b).size.toLong,
          (truth(a) & truth(b)).size.toLong)).toSet

      Seq(1, 7).foreach { parts =>
        val df = rows.toDF("seg", "id").repartition(parts)
        val got = Sketches.segmentOverlap(df, "seg", "id", lgK = 12)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
          .toSet
        assert(got === expected, s"scenario $scenario parts=$parts")
      }
    }
  }

  test("theta overlap drops NULL segments and NULL ids") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)), (Some("a"), None),
      (Some("b"), Some(2L)), (None, Some(3L)), (Some("b"), Some(9L)))
      .toDF("seg", "id")
    val got = Sketches.segmentOverlap(df, "seg", "id", lgK = 12).collect()
    assert(got.length === 1)
    assert((got(0).getString(0), got(0).getString(1), got(0).getLong(2),
      got(0).getLong(3), got(0).getLong(4)) === ("a", "b", 2L, 2L, 1L))
  }

  test("theta sketches accept non-numeric ids (string UUIDs) exactly") {
    // The common audience-id shape: string UUIDs. A cast("long") would
    // NULL every id and crash the typed encoder; the operator must key
    // them via a stable 64-bit hash instead and stay exact.
    val rnd = new scala.util.Random(7)
    val ids = (0 until 400).map(_ => new java.util.UUID(rnd.nextLong(), rnd.nextLong()).toString)
    val rows = ids.zipWithIndex.map { case (id, i) => (s"seg_${i % 3}", id) } ++
      ids.take(50).map(id => ("seg_0", id)) // duplicates must not double-count
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val df = rows.toDF("seg", "id").repartition(5)
    val got = Sketches.estimateSegments(Sketches.segmentSketches(df, "seg", "id", lgK = 12))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === truth.view.mapValues(_.size.toLong).toMap)

    val overlap = Sketches.segmentOverlap(df, "seg", "id", lgK = 12).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    val expected = (for { a <- truth.keys; b <- truth.keys if a < b }
      yield (a, b, (truth(a) & truth(b)).size.toLong)).toSet
    assert(overlap === expected)
  }

  test("freq sketches reject map sizes below the library's floor at the API boundary") {
    val df = Seq(("g", "x")).toDF("grp", "item")
    Seq(2, 4).foreach { m =>
      val e = intercept[IllegalArgumentException](
        Sketches.freqSketches(df, "grp", "item", maxMapSize = m))
      assert(e.getMessage.contains(">= 8"), s"maxMapSize=$m")
    }
  }

  test("theta estimation mode stays within the published relative-error bound") {
    // 60k distinct ids through a lgK=10 (1024-entry) sketch: deep in
    // sampling territory. Theta RSE is ~1/sqrt(2^lgK); assert 5 sigma.
    val n = 60000
    val df = (0 until n).map(i => ("all", i.toLong)).toDF("seg", "id")
      .repartition(5)
    val est = Sketches.segmentSketches(df, "seg", "id", lgK = 10)
      .collect()(0).getAs[Array[Byte]]("sketch")
    val estimate = org.apache.datasketches.theta.Sketches
      .wrapCompactSketch(org.apache.datasketches.memory.Memory.wrap(est))
      .getEstimate
    val rse = 1.0 / math.sqrt(1 << 10)
    assert(math.abs(estimate - n) < 5 * rse * n,
      s"estimate $estimate vs $n outside 5-sigma band")
  }

  test("sketch dauMau == exact dauMau in exact mode, across partitionings") {
    (0 until 5).foreach { scenario =>
      val rnd = new scala.util.Random(99 + scenario)
      // nanos timestamps over ~90 days, sparse users: windows straddle
      // day gaps and the activity sets genuinely differ day to day
      val rows = (0 until 800 + rnd.nextInt(800)).map { _ =>
        val day = rnd.nextInt(90).toLong
        val sec = day * 86400L + rnd.nextInt(86400)
        (sec * 1000000000L, rnd.nextInt(120).toLong)
      }
      Seq(1, 7).foreach { parts =>
        val df = rows.toDF("ts", "user_id").repartition(parts)
        val got = Sketches.dauMau(df, windowDays = 30, lgK = 12)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val expected = graft.ext.Events.dauMau(df, windowDays = 30)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got === expected, s"scenario $scenario parts=$parts")
      }
    }
  }

  test("sketch state survives a parquet round trip and merges losslessly (all three kinds)") {
    // The operational story: today's state is WRITTEN, tomorrow re-READS
    // it and merges the delta — the BINARY blobs must survive the sink
    // byte-for-usefully (wrap/heapify on read) for every sketch kind.
    val rnd = new scala.util.Random(2718)
    val all = (0 until 1500).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(350).toLong, rnd.nextInt(900) / 8.0)
    }
    val (hist, delta) = all.splitAt(900)
    val hd = hist.toDF("g", "id", "v").repartition(5)
    val dd = delta.toDF("g", "id", "v").repartition(3)
    val fd = all.toDF("g", "id", "v").repartition(4)

    def persisted(state: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory("graft_state_rt_").toString
      graft.etl.Sinks.parquetDir(state, dir)
      spark.read.parquet(dir)
    }

    val theta = Sketches.estimateSegments(Sketches.mergeSegmentSketches(12,
      persisted(Sketches.segmentSketches(hd, "g", "id", lgK = 12)),
      Sketches.segmentSketches(dd, "g", "id", lgK = 12)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val thetaFull = Sketches.estimateSegments(
      Sketches.segmentSketches(fd, "g", "id", lgK = 12))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(theta === thetaFull, "theta through disk")

    val kll = Sketches.readQuantiles(Sketches.mergeGroupSketches(2048,
      persisted(Sketches.groupSketches(hd, "g", "v", k = 2048)),
      Sketches.groupSketches(dd, "g", "v", k = 2048)), Seq(0.25, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val kllFull = Sketches.readQuantiles(
      Sketches.groupSketches(fd, "g", "v", k = 2048), Seq(0.25, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(kll === kllFull, "kll through disk")

    val freq = Sketches.frequentItems(Sketches.mergeFreqSketches(512,
      persisted(Sketches.freqSketches(hd, "g", "id", maxMapSize = 512)),
      Sketches.freqSketches(dd, "g", "id", maxMapSize = 512)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val freqFull = Sketches.frequentItems(
      Sketches.freqSketches(fd, "g", "id", maxMapSize = 512))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(freq === freqFull, "freq through disk")
  }

  test("sketch state + delta merges == from-scratch builds (all three kinds)") {
    (0 until 5).foreach { scenario =>
      val rnd = new scala.util.Random(314 + scenario)
      val all = (0 until 1200).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(400).toLong, rnd.nextInt(500) / 4.0)
      }
      val (hist, delta) = all.splitAt(700 + rnd.nextInt(300))
      val hd = hist.toDF("g", "id", "v").repartition(5)
      val dd = delta.toDF("g", "id", "v").repartition(3)
      val fd = all.toDF("g", "id", "v").repartition(4)

      // theta: distinct ids per group — exact mode, byte-level equality
      // is not promised, estimates are
      val tMerged = Sketches.estimateSegments(Sketches.mergeSegmentSketches(12,
        Sketches.segmentSketches(hd, "g", "id", lgK = 12),
        Sketches.segmentSketches(dd, "g", "id", lgK = 12)))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val tFull = Sketches.estimateSegments(
        Sketches.segmentSketches(fd, "g", "id", lgK = 12))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(tMerged === tFull, s"theta scenario $scenario")

      // kll: below capacity the merge is lossless — quantiles equal
      val probs = Seq(0.25, 0.5, 0.75, 1.0)
      val kMerged = Sketches.readQuantiles(Sketches.mergeGroupSketches(2048,
        Sketches.groupSketches(hd, "g", "v", k = 2048),
        Sketches.groupSketches(dd, "g", "v", k = 2048)), probs)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      val kFull = Sketches.readQuantiles(
        Sketches.groupSketches(fd, "g", "v", k = 2048), probs)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(kMerged === kFull, s"kll scenario $scenario")

      // freq: id-as-item counts within the map budget — exact equality
      val fMerged = Sketches.frequentItems(Sketches.mergeFreqSketches(1024,
        Sketches.freqSketches(hd, "g", "id", maxMapSize = 1024),
        Sketches.freqSketches(dd, "g", "id", maxMapSize = 1024)))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val fFull = Sketches.frequentItems(
        Sketches.freqSketches(fd, "g", "id", maxMapSize = 1024))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(fMerged === fFull, s"freq scenario $scenario")
    }
  }

  // ---------------------------------------------------------- freq items

  test("frequent items == exact contingency counts in exact mode, any partitioning") {
    (0 until 5).foreach { scenario =>
      val rnd = new scala.util.Random(17 + scenario)
      val rows = (0 until 1000 + rnd.nextInt(1000)).map { _ =>
        (s"g${rnd.nextInt(3)}", s"item_${rnd.nextInt(20)}")
      }
      val expected = rows.groupBy(identity).map { case ((g, v), xs) =>
        (g, v, xs.size.toLong)
      }.toSet
      Seq(1, 7).foreach { parts =>
        val df = rows.toDF("g", "v").repartition(parts)
        val st = Sketches.freqSketches(df, "g", "v", maxMapSize = 64)
        val got = Sketches.frequentItems(st).collect().map { r =>
          assert(r.getLong(3) === r.getLong(2) && r.getLong(4) === r.getLong(2),
            s"bounds not collapsed in exact mode: $r")
          (r.getString(0), r.getString(1), r.getLong(2))
        }.toSet
        assert(got === expected, s"scenario $scenario parts=$parts")
      }
    }
  }

  test("frequent items estimation mode: bounds valid, heavy items never missed") {
    // zipf-ish stream through an adversarially tiny 8-counter map:
    // purges happen constantly; the guarantees under test are the
    // deterministic ones — lb <= true <= ub for returned items, and no
    // item whose true count exceeds every partition-sketch error
    // envelope is absent (NO_FALSE_NEGATIVES after lossless merge).
    val rnd = new scala.util.Random(5)
    val hot = Seq.fill(3000)("hot") ++ (0 until 2000).map(i => s"h${i % 3}")
    val noise = (0 until 8000).map(_ => s"n_${rnd.nextInt(900)}")
    val rows = rnd.shuffle(hot ++ noise).map(("g", _))
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val df = rows.toDF("g", "v").repartition(6)
    val got = Sketches.frequentItems(Sketches.freqSketches(df, "g", "v", maxMapSize = 8))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.foreach { case (item, _, lb, ub) =>
      val t = truth(item)
      assert(lb <= t && t <= ub, s"$item: true $t outside [$lb, $ub]")
    }
    val returned = got.map(_._1).toSet
    assert(returned.contains("hot"),
      s"dominant item missing from NO_FALSE_NEGATIVES read: $returned")
  }

  // ------------------------------------------------------------------ kll

  /** The INCLUSIVE order statistic groupQuantiles promises in exact
    * mode: smallest value whose 1-based rank in the sorted run reaches
    * ceil(p * n). */
  private def orderStat(sorted: Vector[Double], p: Double): Double =
    sorted(math.ceil(p * sorted.size).toInt - 1)

  test("kll quantiles == exact order statistics below capacity, any partitioning") {
    (0 until 10).foreach { scenario =>
      val rnd = new scala.util.Random(7 + scenario)
      val probs = Seq(0.1, 0.5, 0.9, 1.0)
      val rows = (0 until 300 + rnd.nextInt(400)).map { _ =>
        (s"g${rnd.nextInt(3)}", (rnd.nextInt(2000) - 1000) / 8.0)
      }
      val truth = rows.groupBy(_._1).view
        .mapValues(g => g.map(_._2).toVector.sorted).toMap
      val expected = (for {
        (g, sorted) <- truth; p <- probs
      } yield (g, p, orderStat(sorted, p))).toSet

      Seq(1, 7).foreach { parts =>
        val df = rows.toDF("g", "v").repartition(parts)
        val got = Sketches.groupQuantiles(df, "g", "v", probs, k = 2048)
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
          .toSet
        assert(got === expected, s"scenario $scenario parts=$parts")
      }
    }
  }

  test("kll quantiles exclude NULL and NaN values") {
    val df = Seq(("g", Some(1.0)), ("g", Some(Double.NaN)), ("g", None),
      ("g", Some(3.0)), ("g", Some(2.0))).toDF("g", "v")
    val got = Sketches.groupQuantiles(df, "g", "v", Seq(0.5, 1.0), k = 64)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    assert(got === Map(0.5 -> 2.0, 1.0 -> 3.0))
  }

  test("kll estimation mode honors the sketch's own normalized rank error bound") {
    // adversarially sorted input (worst case for naive samplers), far
    // past capacity: quantile at p must sit within eps of rank p.
    val n = 50000
    val k = 200
    val df = (0 until n).map(i => ("g", i.toDouble)).toDF("g", "v").repartition(5)
    val eps = KllDoublesSketch.newHeapInstance(k).getNormalizedRankError(false)
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = Sketches.groupQuantiles(df, "g", "v", probs, k = k)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    probs.foreach { p =>
      val rankOfAnswer = (got(p) + 1) / n // value i has inclusive rank (i+1)/n
      assert(math.abs(rankOfAnswer - p) <= eps * 1.5,
        s"p=$p got rank $rankOfAnswer (eps=$eps)")
    }
  }
}
