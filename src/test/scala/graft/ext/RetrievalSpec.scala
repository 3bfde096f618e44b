package graft.ext

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {

  // independent in-test BM25 reference: plain Scala over token maps,
  // same constants (k1 = 6/5, b = 3/4, idf argument (2N+2)/(2df+1))
  private def referenceBm25(corpus: Seq[(Long, String)], k: Int, nQ: Int)
      : Set[(String, Long, Int, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty)
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) }
    }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = dl.size.toLong
    val s = dl.values.sum
    val qt = df.toSeq.sortBy { case (w, d) => (-d, w) }.take(nQ).map(_._1).toSet
    tf.filter(t => qt(t._2)).groupBy(_._2).toSeq.flatMap { case (w, posts) =>
      posts.map { case (id, _, f) =>
        val tfPart = (44.0 * s * f) / (20.0 * s * f + 6.0 * s + 18.0 * dl(id) * n)
        (id, f, tfPart)
      }.sortBy { case (id, _, tp) => (-tp, id) }.zipWithIndex.take(k)
        .map { case ((id, _, tp), i) =>
          val bm25 = math.log((2.0 * n + 2) / (2.0 * df(w) + 1)) * tp
          (w, id, i + 1, math.round(bm25 * 1e9))
        }
    }.toSet
  }

  private val corpus = Seq(
    (1L, "spark engines process data at scale with spark executors"),
    (2L, "data pipelines move data between data systems"),
    (3L, "a tiny doc"),
    (4L, "spark spark spark everywhere in this spark document about spark"),
    (5L, "engines and pipelines and engines again"),
    (6L, "unrelated words entirely about gardening and cooking here"))

  test("bm25TopK matches an independent reference on ranks and nano scores") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), k = 3, nQueryTerms = 4)
      .collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("bm25_nano"))).toSet
    assert(got === referenceBm25(corpus, k = 3, nQ = 4))
    assert(got.nonEmpty)
  }

  test("bm25TopK: higher tf wins within a term when lengths are equal-ish; saturation bounded") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), k = 6, nQueryTerms = 8)
      .collect()
    // the spark-stuffed doc 4 must rank first for 'spark'
    val sparkRows = got.filter(_.getAs[String]("term") == "spark")
      .sortBy(_.getAs[Int]("rank"))
    assert(sparkRows.head.getAs[Long]("doc_id") === 4L)
    // tf_part is bounded by (k1+1)/1 ratio: nano score stays positive and finite
    assert(got.forall(_.getAs[Long]("bm25_nano") >= 0L))
  }
}
