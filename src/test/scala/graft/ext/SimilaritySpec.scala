package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)), // near 0
      (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal to 0
      (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
      (4L, Array(0.8f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks by cosine, excludes self, deterministic") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 1), (4L, 2), (2L, 3)))
  }

  test("cosine math: orthogonal=0, opposite=-1, identical=1") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(1.0, 0.0), Array(-1.0, 0.0)),
      (Array(0.5, 0.5), Array(0.5, 0.5))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0)) < 1e-12)
    assert(math.abs(cs(1) + 1) < 1e-12)
    assert(math.abs(cs(2) - 1) < 1e-12)
  }

  test("lshTopK recall against exact top-10 on the fixture corpus") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(emb, queries, k = 10))
    // 6 planes -> 64 buckets over 500 vectors, plus 1-bit probes: dense
    // enough that every query must recover part of its true top-10 even
    // on near-uniform random embeddings (recall is data-dependent; real
    // corpora cluster far more than this fixture).
    val approx = topSets(Similarity.lshTopK(emb, queries, k = 10, planes = 6))
    exact.foreach { case (q, ex) =>
      val overlap = ex.intersect(approx.getOrElse(q, Set.empty)).size
      assert(overlap >= 1, s"query $q: no overlap between approx=$approx and exact top-10")
    }
  }

  test("broadcastQueries=false: identical results, no broadcast exchange in plan") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect() // materialize so AQE finalizes the physical plan
      df.queryExecution.executedPlan.toString.contains("BroadcastExchange") ||
        df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop")
    }
    // reference results under default planning (auto-broadcast allowed)
    val bfRef = rows(Similarity.bruteForceTopK(emb, queries, k = 10))
    val lshRef = rows(Similarity.lshTopK(emb, queries, k = 10))
    // simulate corpus-sized query stats: with auto-broadcast off (plan
    // AND AQE runtime), the unhinted variant must fall back to the
    // partitioned shapes — cartesian block join / shuffled equi-join —
    // while a hinted variant would still force a broadcast regardless
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    confs.foreach(spark.conf.set(_, "-1"))
    try {
      val bfS = Similarity.bruteForceTopK(emb, queries, k = 10, broadcastQueries = false)
      assert(rows(bfS) === bfRef)
      assert(!hasBroadcast(bfS), "shuffle variant must not broadcast the query side")
      val lshS = Similarity.lshTopK(emb, queries, k = 10, broadcastQueries = false)
      assert(rows(lshS) === lshRef)
      assert(!hasBroadcast(lshS), "shuffle variant must not broadcast the probe side")
      val hintedStill = Similarity.bruteForceTopK(emb, queries, k = 10)
      assert(hasBroadcast(hintedStill), "hinted variant should broadcast even with stats off")
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("srp signature is deterministic across evaluations") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(20)
    val s1 = emb.select(col("vec_id"),
      Similarity.srpSignature(transform(col("embedding"), x => x.cast("double")), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = emb.select(col("vec_id"),
      Similarity.srpSignature(transform(col("embedding"), x => x.cast("double")), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
  }
}
