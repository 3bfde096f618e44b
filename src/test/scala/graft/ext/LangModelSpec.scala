package graft.ext

import graft.SparkTestBase

class LangModelSpec extends SparkTestBase {

  // independent reference: plain-Scala add-one bigram NLL with the same
  // nano quantization discipline
  private def referenceNll(ref: Seq[(Long, String)], cand: Seq[(Long, String)])
      : Map[Long, (Long, Long)] = {
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def pairs(ts: Seq[String]) = ts.zip(ts.tail)
    val refToks = ref.map { case (_, t) => toks(t) }
    val c2 = refToks.flatMap(pairs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = refToks.flatten.distinct.size.toLong
    cand.map { case (id, t) => id -> pairs(toks(t)) }
      .filter(_._2.nonEmpty)
      .map { case (id, ps) =>
        val lps = ps.map { p =>
          math.round(math.log((c2.getOrElse(p, 0L) + 1.0) /
            (c1.getOrElse(p._1, 0L) + v)) * 1e9)
        }
        id -> (ps.size.toLong, -lps.sum)
      }.toMap
  }

  private val ref = Seq(
    (0L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (4L, "a cat and a dog"))
  private val cand = Seq(
    (1L, "the cat sat on the rug"),     // in-domain: low NLL
    (3L, "zebra quantum flux paradox"), // all-unseen: uniform floor
    (5L, "word"))                       // single token: no pairs -> absent

  test("bigramNll matches an independent reference, nano-exact") {
    import spark.implicits._
    val got = LangModel.bigramNll(ref.toDF("doc_id", "text"), cand.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === referenceNll(ref, cand))
    assert(got.contains(1L) && got.contains(3L) && !got.contains(5L))
    // the in-domain doc must score better (lower NLL per pair) than noise
    val perPair1 = got(1L)._2.toDouble / got(1L)._1
    val perPair3 = got(3L)._2.toDouble / got(3L)._1
    assert(perPair1 < perPair3)
  }

  test("unseen context degrades to the uniform 1/V floor, never zero probability") {
    import spark.implicits._
    val got = LangModel.bigramNll(ref.toDF("doc_id", "text"),
        Seq((7L, "xx yy")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    val v = ref.flatMap(t => t._2.trim.toLowerCase.split("\\s+")).distinct.size
    assert(got === ((1L, -math.round(math.log(1.0 / v) * 1e9))))
  }
}
