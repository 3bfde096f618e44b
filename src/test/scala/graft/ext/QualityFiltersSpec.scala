package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the round-14 curation additions: C4/Gopher quality filters,
  * robust scaling, inter-arrival profiles, and the PCM audio-feature
  * path (decodeWavPcm round trip + integer signal stats). */
class QualityFiltersSpec extends SparkTestBase {
  import spark.implicits._

  test("quality filters: counts, ratios, and markers on hand-built docs") {
    val docs = Seq(
      (1L, "the   quick\nbrown fox."),          // 4 words, 2 lines, terminal .
      (2L, "short {code} block"),               // brace marker
      (3L, "Lorem Ipsum dolor sit amet"),       // lorem marker (case-folded)
      (4L, "enable JavaScript to continue"),    // js marker
      (5L, "")                                  // empty: all-zero guards
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilters(docs, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_words") === 4L)
    assert(out(0).getAs[Long]("n_lines") === 2L)
    // mean word length: 17 non-space chars / 4 words = 4.25
    assert(out(0).getAs[Long]("mean_word_len_micro") === 4250000L)
    assert(out(0).getAs[Boolean]("terminal_punct"))
    assert(out(1).getAs[Boolean]("has_brace"))
    assert(out(2).getAs[Boolean]("has_lorem"))
    assert(out(3).getAs[Boolean]("has_js"))
    assert(out(4).getAs[Long]("n_words") === 0L)
    assert(out(4).getAs[Long]("n_lines") === 0L)
    assert(out(4).isNullAt(out(4).fieldIndex("mean_word_len_micro")))
    // every marker doc fails the keep band
    assert(out.forall(!_.getAs[Boolean]("keep")))
  }

  test("quality filters keep band admits a clean long document") {
    val word = "solid "
    val doc = (word * 60).trim // 60 words, mean length 5, all alpha+space
    val out = TextAnalysis.qualityFilters(Seq((1L, doc)).toDF("doc_id", "text"), "text")
      .collect()(0)
    assert(out.getAs[Long]("n_words") === 60L)
    assert(out.getAs[Long]("mean_word_len_micro") === 5000000L)
    assert(out.getAs[Boolean]("keep"))
  }

  test("robust scale: exact quartile cuts and sign-safe half-up ratio") {
    // group g: values 1..8 -> lower quartiles q1=2, med=4, q3=6, IQR=4
    val df = (1 to 8).map(v => ("g", v.toDouble)).toDF("g", "v")
    val out = Features.robustScale(df, "g", "v")
      .orderBy("v").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    // (v-4)/4 in micro: v=1 -> -750000, v=4 -> 0, v=8 -> 1000000
    assert(out.toSeq === Seq(
      (1.0, -750000L), (2.0, -500000L), (3.0, -250000L), (4.0, 0L),
      (5.0, 250000L), (6.0, 500000L), (7.0, 750000L), (8.0, 1000000L)))
  }

  test("robust scale: exact ratio at extreme values, both signs") {
    // med=0, IQR=2 over {-3,-1,0,1,3}: q1=-1? cum/4 cuts: values
    // -3,-1,0,1,3 each count 1, tot=5: q1 = min v with 4cum>=5 -> -1;
    // med = min v with 2cum>=5 -> 0; q3 = min v with 4cum>=15 -> 1.
    val df = Seq(-3.0, -1.0, 0.0, 1.0, 3.0).map(("g", _)).toDF("g", "v")
    val out = Features.robustScale(df, "g", "v").orderBy("v").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    // IQR = 2; (v-0)/2 micro: -3 -> -1500000, 3 -> 1500000 (exact)
    assert(out.head === ((-3.0, -1500000L)))
    assert(out.last === ((3.0, 1500000L)))
  }

  test("robust scale: degenerate IQR and null values surface null") {
    val df = Seq(("g", Some(5.0)), ("g", Some(5.0)), ("g", Some(5.0)),
      ("g", None)).toDF("g", "v")
    val out = Features.robustScale(df, "g", "v").collect()
    assert(out.length === 4)
    assert(out.forall(_.isNullAt(2)))
  }

  test("iqr outliers: both fences exact, interior points untouched") {
    // group g: bulk 1..8 (q1=2, q3=6, IQR=4; fences at 2-6= -4 and
    // 6+6=12), plus -5 (low) and 13 (high); -4 and 12 sit ON the fence
    // and must NOT flag (strict inequality)
    val df = ((1 to 8).map(_.toDouble) ++ Seq(-5.0, 13.0, -4.0, 12.0))
      .map(("g", _)).toDF("g", "v")
    val out = Features.iqrOutliers(df, "g", "v")
      .collect().map(r => (r.getDouble(1), r.getString(2))).sortBy(_._1)
    // with the two extra interior-ish points the quartiles shift: re-read
    // cuts from the operator's own contract instead of hand math? No —
    // pin exactly: values sorted: -5,-4,1..8,12,13 (n=12); q1 = min v
    // with 4cum>=12 -> cum>=3 -> v=1; q3 = min v with 4cum>=36 -> cum>=9
    // -> v=7; IQR=6; fences: 1-9=-8 and 7+9=16 -> only nothing flags?
    // -5 > -8 and 13 < 16 -> EMPTY. Assert that explicitly.
    assert(out.isEmpty, s"fence math: $out")
    // a genuinely heavy tail: bulk 1..20 (q1=6, q3=16, IQR=10, fences
    // -9 and 31) plus 1000 -> exactly one high outlier
    val df2 = ((1 to 20).map(_.toDouble) ++ Seq(1000.0))
      .map(("g", _)).toDF("g", "v")
    val out2 = Features.iqrOutliers(df2, "g", "v")
      .collect().map(r => (r.getDouble(1), r.getString(2)))
    assert(out2.toSeq === Seq((1000.0, "high")))
  }

  test("inter-arrival: exact gaps, discrete quantiles, half-up mean") {
    // key k: events at 0, 10, 30, 70, 150 -> gaps 10, 20, 40, 80
    val df = Seq(0L, 10L, 30L, 70L, 150L).zipWithIndex
      .map { case (sec, i) => ("k", sec, i.toLong) }
      .toDF("k", "sec", "id")
    val out = Events.interArrival(df, "k", "sec", "id").collect()(0)
    assert(out.getAs[Long]("n_gaps") === 4L)
    assert(out.getAs[Long]("p50_gap") === 20L) // cum 2/4 at gap 20
    assert(out.getAs[Long]("p90_gap") === 80L)
    // mean = 150/4 = 37.5 -> half-up micro 37500000
    assert(out.getAs[Long]("mean_gap_micro") === 37500000L)
  }

  test("inter-arrival: same-second bursts order by id deterministically") {
    val df = Seq(("k", 5L, 2L), ("k", 5L, 1L), ("k", 9L, 3L))
      .toDF("k", "sec", "id")
    val out = Events.interArrival(df, "k", "sec", "id").collect()(0)
    assert(out.getAs[Long]("n_gaps") === 2L) // gaps 0 (tie) and 4
    assert(out.getAs[Long]("p50_gap") === 0L)
  }

  test("quality gate: folded (key, keep) counts equal the one-shot pass") {
    import graft.streaming.StreamingOps
    val stateDir = java.nio.file.Files.createTempDirectory("quality_spec_").toString
    val word = "steady "
    val docs = (0L until 90L).map { i =>
      val lang = "l" + (i % 3)
      val text = if (i % 4 == 0) "too short" else (word * 60).trim
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val Seq(b0, b1, b2) = Seq(0L, 1L, 2L).map(m =>
      docs.filter(pmod(col("doc_id"), lit(3L)) === m))
    StreamingOps.applyQualityBatch(b0, 0L, "text", "lang", stateDir)
    StreamingOps.applyQualityBatch(b1, 1L, "text", "lang", stateDir)
    StreamingOps.applyQualityBatch(b1, 1L, "text", "lang", stateDir) // replay
    StreamingOps.applyQualityBatch(b2, 2L, "text", "lang", stateDir)
    val gate = StreamingOps.qualityGateResult(spark, stateDir, "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one-shot reference off the batch operator itself
    val oneShot = TextAnalysis.qualityFilters(docs, "text")
      .groupBy("lang")
      .agg(count(lit(1L)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(gate.map(t => (t._1, t._2, t._3)).toSeq === oneShot.toSeq)
    // keep-rate divmod: 90 docs, 30 per lang; i%4==0 drops ~1/4
    gate.foreach { case (_, n, k, rate) =>
      assert(rate === (k * 2000000L + n) / (2L * n))
      assert(k > 0L && k < n, "both filter branches exercised")
    }
  }

  test("decodeWavPcm round-trips samples exactly; audioFeatures exact") {
    val samples = Array[Short](100, -200, 0, 300, -50, 99)
    val wav = MediaCodecs.encodeWav16(16000, 1, samples)
    val pcm = MediaCodecs.decodeWavPcm(wav).get
    assert(pcm.sampleRate === 16000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === samples.toSeq)

    val df = Seq((1L, samples.map(_.toInt).toSeq)).toDF("doc_id", "samples")
    val out = Multimodal.audioFeatures(df, "samples").collect()(0)
    assert(out.getAs[Long]("n_samples") === 6L)
    assert(out.getAs[Long]("energy") ===
      samples.map(s => s.toLong * s).sum)
    assert(out.getAs[Long]("sum_abs") === samples.map(s => math.abs(s.toLong)).sum)
    assert(out.getAs[Long]("peak") === 300L)
    // strict sign products: (100,-200)<0, (-200,0)=0, (0,300)=0,
    // (300,-50)<0, (-50,99)<0 -> 3
    assert(out.getAs[Long]("zero_crossings") === 3L)
    assert(out.getAs[Long]("silence_n") === 3L) // 0, -50, 99
  }

  test("audioFeatures: empty and single-sample arrays hit the guards") {
    val df = Seq((1L, Seq.empty[Int]), (2L, Seq(42))).toDF("doc_id", "samples")
    val out = Multimodal.audioFeatures(df, "samples")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_samples") === 0L)
    assert(out(0).getAs[Long]("peak") === 0L)
    assert(out(0).getAs[Long]("zero_crossings") === 0L)
    assert(out(1).getAs[Long]("zero_crossings") === 0L)
    assert(out(1).getAs[Long]("peak") === 42L)
  }
}
