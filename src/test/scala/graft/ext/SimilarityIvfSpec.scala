package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilarityIvfSpec extends SparkTestBase {

  test("ivfTopK recovers most exact top-10 neighbors on the fixture corpus") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(emb, queries, k = 10))
    val ivf = topSets(Similarity.ivfTopK(emb, queries, k = 10, nCells = 8, nProbe = 4))
    // probing half the cells must recover a solid share of true neighbors
    val recalls = exact.map { case (q, ex) =>
      ex.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.sum / recalls.size} too low: $recalls")
  }

  test("ivfTopK is deterministic across runs (fixed seed)") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val r1 = Similarity.ivfTopK(emb, q, k = 5).collect().toSet
    val r2 = Similarity.ivfTopK(emb, q, k = 5).collect().toSet
    assert(r1 === r2)
  }

  test("streamed postings deltas serve searches identical to the one-shot index") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val centroidDir = java.nio.file.Files.createTempDirectory("ivfg_cent_").toString + "/c"
    Similarity.ivfCentroidState(emb, nCells = 4)
      .write.parquet(centroidDir)
    val stateDir = java.nio.file.Files.createTempDirectory("ivfg_state_").toString
    (0 until 3).foreach { g =>
      graft.streaming.StreamingOps.applyIvfIngestBatch(
        emb.filter(pmod(col("vec_id"), lit(3L)) === g), g.toLong,
        centroidDir, stateDir)
    }
    // a foreachBatch replay must be a no-op, not a duplicate delta
    graft.streaming.StreamingOps.applyIvfIngestBatch(
      emb.filter(pmod(col("vec_id"), lit(3L)) === 2), 2L, centroidDir, stateDir)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    val fromIngest = rows(graft.streaming.StreamingOps.ivfSearchFromIngest(
      spark, stateDir, centroidDir, queries, k = 5, nProbe = 2))
    val oneShot = rows(Similarity.ivfTopKFromState(
      emb, queries, spark.read.parquet(centroidDir), k = 5, nProbe = 2))
    assert(fromIngest.nonEmpty && fromIngest === oneShot)
    // exhaustive probing over the drained index == brute force
    val exhaustive = rows(graft.streaming.StreamingOps.ivfSearchFromIngest(
      spark, stateDir, centroidDir, queries, k = 5, nProbe = 4))
    val brute = rows(Similarity.bruteForceTopK(emb, queries, k = 5))
    assert(exhaustive === brute)
  }

  test("embeddingCosine finds planted near-duplicate vectors") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(50)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    // plant: 100 ~= copy of 0 with tiny noise; 101 = exact copy of 1
    val planted = Seq(
      (100L, base(0)._2.map(x => x + 0.01f)),
      (101L, base(1)._2.clone()))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosine(df, threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), s"missing planted near-dup in $pairs")
    assert(pairs.contains((1L, 101L)), s"missing planted exact dup in $pairs")
    // no false positives among random vectors
    assert(pairs.forall { case (a, b) => b >= 100L })
  }
}
