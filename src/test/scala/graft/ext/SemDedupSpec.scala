package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // two tight semantic groups far apart + singletons; cosines inside a
  // group ≥ 0.99, across groups ≈ 0
  private def fixture = Seq(
    (1L, vec(1.0, 0.01, 0.0)), (2L, vec(1.0, 0.02, 0.0)), (3L, vec(1.0, 0.0, 0.02)),
    (10L, vec(0.0, 1.0, 0.01)), (11L, vec(0.0, 1.0, 0.02)),
    (20L, vec(0.01, 0.0, -1.0))
  ).toDF("vec_id", "embedding")

  test("exact face (nCells=1): transitive clusters + keep-lowest-id") {
    val got = Dedup.semdedup(fixture, threshold = 0.95, nCells = 1,
      keepLowestId = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got === Seq(
      (1L, 1L, 1L, true), (2L, 1L, 1L, false), (3L, 1L, 1L, false),
      (10L, 10L, 10L, true), (11L, 10L, 10L, false)))
  }

  test("exact face keep-farthest-from-centroid picks the edge example") {
    // group {1,2,3}: centroid ≈ global mean; doc 3 tilts off-axis most
    // within its cluster relative to the mean of ALL vectors — the keep
    // pick must be the argmin cosine-to-centroid, ties by lowest id
    val out = Dedup.semdedup(fixture, threshold = 0.95, nCells = 1)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // keep_id must be a member of its own cluster, one keep per cluster
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.keySet === Set(1L, 10L))
    byCluster.foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length === 1)
      assert(members.map(_._1).contains(members.head._3))
    }
    // replay the rule driver-side: global mean centroid, lowest cosine wins
    val all = fixture.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val dim = all.head._2.length
    val mean = (0 until dim).map(d => all.map(_._2(d)).sum / all.length)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = Map(
      1L -> Seq(1L, 2L, 3L).minBy(id => (cos(all.find(_._1 == id).get._2, mean), id)),
      10L -> Seq(10L, 11L).minBy(id => (cos(all.find(_._1 == id).get._2, mean), id)))
    byCluster.foreach { case (cid, members) =>
      assert(members.head._3 === expected(cid), s"cluster $cid keep pick")
    }
  }

  test("clustered path matches the exact face on well-separated groups") {
    // 2 clean cells: the quantizer must put each tight group in one
    // cell, so clustered recall is total here and outputs coincide
    val got = Dedup.semdedup(fixture, threshold = 0.95, nCells = 2,
      keepLowestId = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val exact = Dedup.semdedup(fixture, threshold = 0.95, nCells = 1,
      keepLowestId = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(got === exact)
  }

  test("seeded recall battery on planted twins: clustered discard recall >= 0.9") {
    // 120 base vectors on distinct directions; every 4th gets a near-
    // identical twin (cos >= 0.999). Exact discard set = the twins.
    val rnd = new scala.util.Random(5)
    val base = (0 until 120).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat).toSeq)
    }
    val twins = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (id + 1000L, v.updated(0, v.head + 0.001f))
    }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val exactDiscards = Dedup.semdedup(df, threshold = 0.99, nCells = 1,
      keepLowestId = true)
      .filter(!col("is_kept")).select("doc_id").as[Long].collect().toSet
    assert(exactDiscards === twins.map(_._1).toSet)
    val clustered = Dedup.semdedup(df, threshold = 0.99, nCells = 8,
      keepLowestId = true)
      .filter(!col("is_kept")).select("doc_id").as[Long].collect().toSet
    // a twin pairs with its base only; recall = twins still caught when
    // base+twin co-locate in a cell — deterministic under the fixed seed
    assert(clustered.subsetOf(exactDiscards), "clustered path must never over-discard")
    val recall = clustered.size.toDouble / exactDiscards.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }
}
