package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins QualityClassifier (multinomial Naive Bayes with add-one
  * smoothing, integer-nano log-odds): hand-replayed arithmetic on a
  * tiny corpus, the smoothing/unseen-token paths the driver fixture
  * may never hit, state-merge == one-shot, and separation sanity. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, Boolean)*) =
    rows.toDF("doc_id", "text", "label")

  private def nano(x: Double): Long = math.round(x * 1e9)

  test("scores replay the published arithmetic exactly (hand case)") {
    // train: pos = {"good good text", "good stuff"}, neg = {"bad text"}
    // counts: good->(3,0) text->(1,1) stuff->(1,0) bad->(0,1)
    // Np=5, Nn=2, V=4, priors dp=2 dn=1
    val labeled = docs((1L, "good good text", true), (2L, "good stuff", true),
      (3L, "bad text", false))
    val cand = Seq((10L, "good bad"), (11L, "zzz")).toDF("doc_id", "text")
    val out = QualityClassifier.trainScore(labeled, cand)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val prior = nano(math.log(3.0 / 2.0))
    def llr(np: Long, nn: Long): Long =
      nano(math.log((np + 1).toDouble / 9.0)) - nano(math.log((nn + 1).toDouble / 6.0))
    val good = llr(3, 0); val bad = llr(0, 1); val unseen = llr(0, 0)
    assert(out(0) === ((10L, 2L, prior + good + bad, prior + good + bad > 0)))
    // unseen token: class-size correction ln(Nn+V)-ln(Np+V), NOT zero
    assert(unseen === nano(math.log(1.0 / 9.0)) - nano(math.log(1.0 / 6.0)))
    assert(out(1) === ((11L, 1L, prior + unseen, prior + unseen > 0)))
  }

  test("token-free and empty-text candidates score the prior alone") {
    val labeled = docs((1L, "a b", true), (2L, "c", false))
    val cand = Seq((10L, ""), (11L, "   ")).toDF("doc_id", "text")
    val out = QualityClassifier.trainScore(labeled, cand)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prior = nano(math.log(2.0 / 2.0)) // = 0
    assert(out.toSeq === Seq((10L, 0L, prior), (11L, 0L, prior)))
  }

  test("merged per-slice states train the same model as one shot") {
    val all = docs(
      (1L, "alpha beta gamma", true), (2L, "alpha alpha", true),
      (3L, "noise junk", false), (4L, "beta junk junk", false),
      (5L, "gamma gamma alpha", true))
    val slices = (0 until 3).map(i => all.filter(col("doc_id") % 3 === i))
    val mergedTok = QualityClassifier.mergeTokenCountStates(
      slices.map(QualityClassifier.tokenCountState(_)): _*)
    val mergedDoc = QualityClassifier.mergeDocCountStates(
      slices.map(QualityClassifier.docCountState(_)): _*)
    val cand = Seq((10L, "alpha junk"), (11L, "beta gamma")).toDF("doc_id", "text")
    val oneShot = QualityClassifier.trainScore(all, cand)
      .orderBy("doc_id").collect().toSeq
    val fromMerged = QualityClassifier.score(cand, mergedTok, mergedDoc)
      .orderBy("doc_id").collect().toSeq
    assert(fromMerged === oneShot)
  }

  test("separable corpus: held-out docs classify by their class vocabulary") {
    val posWords = Seq("clean", "prose", "article", "well", "written")
    val negWords = Seq("spam", "click", "winner", "casino", "pills")
    val rnd = new scala.util.Random(42)
    def doc(words: Seq[String], n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    val labeled = docs((0 until 40).map { i =>
      val pos = i % 2 == 0
      (i.toLong, doc(if (pos) posWords else negWords, 8), pos)
    }: _*)
    val cand = Seq(
      (100L, doc(posWords, 6)), (101L, doc(negWords, 6)),
      (102L, doc(posWords, 3) + " " + doc(negWords, 1))).toDF("doc_id", "text")
    val out = QualityClassifier.trainScore(labeled, cand)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(out.toSeq === Seq((100L, true), (101L, false), (102L, true)))
  }

  test("deterministic: same input, same scores") {
    val labeled = docs((1L, "x y z", true), (2L, "p q", false), (3L, "x p", true))
    val cand = Seq((9L, "x q y")).toDF("doc_id", "text")
    def run() = QualityClassifier.trainScore(labeled, cand).collect().toSeq
    assert(run() === run())
  }
}
