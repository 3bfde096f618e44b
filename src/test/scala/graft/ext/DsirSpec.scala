package graft.ext

import graft.SparkTestBase

/** DSIR importance selection: in-domain-looking candidates must outrank
  * raw-looking ones; the weight is the exact difference of the two nano
  * NLLs; topN bounds and tie order hold. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("dsirSelect ranks domain-like candidates first, exact weights") {
    val target = (0 until 8).map(i => (100L + i, "alpha beta gamma alpha beta"))
    val raw = (0 until 8).map(i => (200L + i, "delta epsilon zeta delta epsilon"))
    val cand = Seq(
      (1L, "alpha beta gamma"),     // pure domain
      (2L, "delta epsilon zeta"),   // pure raw
      (3L, "alpha beta delta epsilon")) // mixed
      .toDF("doc_id", "text")
    val got = Curation.dsirSelect(cand, target.toDF("doc_id", "text"),
        raw.toDF("doc_id", "text"), topN = 2)
      .select("doc_id", "rank", "logw_nano", "n_pairs")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got(0)._1 == 1L && got(1)._1 == 3L, s"got ${got.toSeq}")
    assert(got(0)._3 > 0L)        // domain doc: raw NLL exceeds target NLL
    assert(got(0)._3 > got(1)._3) // strictly better than the mixed doc

    // exact weight identity: logw == nll_raw - nll_target per doc
    val nt = LangModel.bigramNll(target.toDF("doc_id", "text"), cand)
      .select("doc_id", "nll_nano").as[(Long, Long)].collect().toMap
    val nr = LangModel.bigramNll(raw.toDF("doc_id", "text"), cand)
      .select("doc_id", "nll_nano").as[(Long, Long)].collect().toMap
    got.foreach { case (id, _, w, _) => assert(w == nr(id) - nt(id)) }
  }

  test("temperatureQuota: tau=1 is proportional, tau=0.5 up-samples the tail") {
    // groups: big 400, small 100 -> tau=1 quotas 80/20 of 100;
    // tau=0.5: sqrt weights 20/10 -> 66.67/33.33 -> 67/33
    val docs = ((0 until 400).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    def quotas(tau: Double): Map[String, Long] =
      Curation.temperatureQuota(docs, "lang", "doc_id", 100L, tau)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(quotas(1.0) == Map("big" -> 80L, "small" -> 20L))
    assert(quotas(0.5) == Map("big" -> 67L, "small" -> 33L))
    // seats always sum to the total
    assert(quotas(0.7).values.sum == 100L)
  }

  test("temperatureQuota: guards fail loud") {
    val docs = Seq((1L, "a")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      Curation.temperatureQuota(docs, "lang", "doc_id", 0L, 0.5)
    }
    intercept[IllegalArgumentException] {
      Curation.temperatureQuota(docs, "lang", "doc_id", 10L, 1.5)
    }
  }

  test("funnelLatency: hand funnel, exact positional percentiles") {
    def e(id: Long, u: Long, sec: Long, t: String) = (id, sec * 1000000000L, u, t, 0.0, "")
    // users 1..4 complete view->click with latencies 10, 20, 30, 40;
    // only user 1 completes click->purchase (latency 5)
    val ev = (1L to 4L).flatMap { u =>
      Seq(e(u * 10, u, 100, "view"), e(u * 10 + 1, u, 100 + u * 10, "click"))
    } ++ Seq(e(100, 1L, 115, "purchase"))
    val df = ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.funnelLatency(df, Seq("view", "click", "purchase"))
      .select("transition", "p", "n_users", "lat_sec")
      .as[(String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // n=4: p50 -> rank ceil(2.0)=2 -> 20; p90 -> rank ceil(3.6)=4 -> 40
    assert(got(("step_1_to_2", 0.5)) == (4L, 20L))
    assert(got(("step_1_to_2", 0.9)) == (4L, 40L))
    // n=1: both probes pick the single latency 5
    assert(got(("step_2_to_3", 0.5)) == (1L, 5L))
    assert(got(("step_2_to_3", 0.9)) == (1L, 5L))
  }

  test("dsirSelect: topN >= candidates returns all; guard fails loud") {
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val all = Curation.dsirSelect(docs, docs, docs, topN = 10)
    assert(all.count() == 2)
    intercept[IllegalArgumentException] {
      Curation.dsirSelect(docs, docs, docs, topN = 0)
    }
  }
}
