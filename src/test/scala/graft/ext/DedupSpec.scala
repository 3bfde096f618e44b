package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class DedupSpec extends SparkTestBase {

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near dup
      (3L, "completely different words about spark engines and data pipelines here"),
      (4L, "tiny"),
      (5L, "")).toDF("doc_id", "text")
  }

  test("exact: min id survives, copies counted") {
    val got = Dedup.exact(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 2L) // docs 0 and 1 collapse to id 0
    assert(got.keySet === Set(0L, 2L, 3L, 4L, 5L))
  }

  test("exactRows keeps whole first-id rows") {
    val got = Dedup.exactRows(docs)
    assert(got.count() === 5)
    assert(!got.select("doc_id").collect().map(_.getLong(0)).contains(1L))
  }

  test("ngramJaccard finds exact+near dup pairs, nothing else") {
    val got = Dedup.ngramJaccard(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(got.find(t => t._1 == 0L && t._2 == 1L).get._3 === 1.0)
  }

  test("minhash agrees with exact ngramJaccard on verified pairs") {
    val exact = Dedup.ngramJaccard(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhash(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh === exact)
  }

  test("minhash jaccard values are exact (verification pass)") {
    val mh = Dedup.minhash(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(mh((0L, 1L)) === 1.0)
    assert(mh((0L, 2L)) > 0.5 && mh((0L, 2L)) < 1.0)
  }

  test("simhash: identical docs at distance 0, near dups within 3, distinct docs out") {
    val got = Dedup.simhash(docs, maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((0L, 1L)) === 0)
    assert(!got.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("determinism: same input, same signatures across runs") {
    val r1 = Dedup.minhash(docs, threshold = 0.5).collect().toSet
    val r2 = Dedup.minhash(docs, threshold = 0.5).collect().toSet
    assert(r1 === r2)
  }
}
