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

  test("rankingEval: hand-computed NDCG/MRR/P/R at k=3, zero-hit and truth-only queries") {
    import spark.implicits._
    val gain = (r: Int) =>
      math.floor(1.0e9 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong
    // q1: ranked a,b,c; truth {b, d} -> one hit at rank 2
    // q2: ranked x,y; truth {z} -> zero hits, zero metrics
    // q3: in truth only -> zero row still reported (n_rel = 1)
    // q4: perfect: ranked p,q; truth {p, q} (dup truth row dedupes)
    val ranked = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3),
      (2L, 21L, 1), (2L, 22L, 2),
      (4L, 41L, 1), (4L, 42L, 2)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 12L), (1L, 14L), (2L, 29L), (3L, 31L),
      (4L, 41L), (4L, 42L), (4L, 42L)).toDF("query_id", "doc_id")
    val got = Retrieval.rankingEval(ranked, truth, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getLong(1) === 2L && q1.getLong(2) === 1L) // n_rel, hits
    assert(q1.getLong(3) === 500000000L)                 // mrr = 1e9/2
    assert(q1.getLong(4) === gain(2))                    // dcg
    assert(q1.getLong(5) === gain(1) + gain(2))          // idcg: min(2,3)=2
    assert(q1.getLong(6) === gain(2) * 1000000L / (gain(1) + gain(2)))
    assert(q1.getLong(7) === 333333L && q1.getLong(8) === 500000L)
    val q2 = got(2L)
    assert(q2.getLong(2) === 0L && q2.getLong(3) === 0L &&
      q2.getLong(4) === 0L && q2.getLong(6) === 0L)
    val q3 = got(3L)
    assert(q3.getLong(1) === 1L && q3.getLong(2) === 0L)
    val q4 = got(4L)
    assert(q4.getLong(1) === 2L && q4.getLong(2) === 2L)
    assert(q4.getLong(3) === 1000000000L)
    assert(q4.getLong(6) === 1000000L) // perfect NDCG
    assert(q4.getLong(8) === 1000000L) // perfect recall
  }

  test("rankingEval: a run with duplicate (query, doc) rows counts each doc once at its best rank") {
    import spark.implicits._
    val gain = (r: Int) =>
      math.floor(1.0e9 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong
    // doc 11 listed at ranks 1 AND 3, doc 12 at rank 2 twice: hits must
    // be 2 (not 4), dcg must use ranks 1 and 2 only, precision <= 1e6
    val ranked = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 11L, 3),
      (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 11L), (1L, 12L)).toDF("query_id", "doc_id")
    val r = Retrieval.rankingEval(ranked, truth, k = 3).head()
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L) // n_rel, hits
    assert(r.getLong(3) === 1000000000L)               // mrr: best rank 1
    assert(r.getLong(4) === gain(1) + gain(2))         // dcg, deduped
    assert(r.getLong(6) === 1000000L)                  // ndcg perfect
    assert(r.getLong(7) === 666666L)                   // precision 2/3
    assert(r.getLong(8) === 1000000L)                  // recall capped at 1e6
  }

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

  test("hybridRrfTopK: integer-exact truncated-list RRF over dense+sparse ranks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry date"),
      (2L, "apple banana cherry"),
      (3L, "apple banana"),
      (4L, "apple"),
      (5L, "kiwi lemon mango")).toDF("doc_id", "text")
    // cosines vs query (1,0): doc5 0.99995 > doc2 0.9939 > doc4 0.707 > doc3 0
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.5f, 0.5f)),
      (5L, Array(1.0f, 0.01f))).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(1L)).toDF("doc_id")
    // kRank=2 truncation: dense list = (5 r1, 2 r2); sparse shared
    // counts 2→3, 3→2, 4→1 so sparse list = (2 r1, 3 r2).
    // part(r1)=1000000 div 61=16393, part(r2)=1000000 div 62=16129.
    val got = Retrieval.hybridRrfTopK(docs, vecs, q, k = 3, kRank = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), r.getInt(5))).toSet
    assert(got === Set(
      (1L, 2L, 32522L, Some(2), Some(1), 1),   // both rankers
      (1L, 5L, 16393L, Some(1), None, 2),      // dense-only
      (1L, 3L, 16129L, None, Some(2), 3)))     // sparse-only
  }

  test("hybridRrfTopK: repeated tokens count once; zero-overlap docs never in sparse") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple apple apple apple"),
      (3L, "banana apple extra"),
      (4L, "kiwi lemon")).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Retrieval.hybridRrfTopK(docs, vecs,
        Seq(Tuple1(1L)).toDF("doc_id"), k = 4, kRank = 4)
      .collect().map(r => (r.getLong(1), Option(r.get(4)))).toMap
    // doc3 shares {apple, banana}=2 → sparse r1; doc2 shares {apple}=1
    // (multiplicity ignored) → r2; doc4 shares nothing → absent
    assert(got(3L) === Some(1) && got(2L) === Some(2))
    assert(got(4L) === None)
  }
}
