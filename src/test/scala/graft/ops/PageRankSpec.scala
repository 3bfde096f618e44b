package graft.ops

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference of the identical integer recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int, r0: Long): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 15L * r0 / 100
    var rank = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val inbound = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      nodes.foreach(n => inbound(n) += 0L) // self-loop keeps every node
      e.foreach { case (s, d) => inbound(d) += rank(s) / deg(s) }
      rank = inbound.map { case (n, s) => n -> (base + 85L * s / 100) }.toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the integer recurrence on a hub-and-spoke graph") {
    // spokes all point at the hub; hub points back at one spoke
    val edges = (2L to 10L).map(_ -> 1L) :+ (1L -> 2L)
    assert(run(edges, 5) === reference(edges, 5, 1000000000L))
  }

  test("a no-inbound node survives every round at base-rank decay") {
    val edges = Seq(7L -> 1L, 1L -> 2L, 2L -> 1L)
    val got = run(edges, 4)
    val ref = reference(edges, 4, 1000000000L)
    assert(got === ref)
    assert(got.contains(7L), "dangling-source node must stay in the frame")
    // node 7 receives nothing: rank = base after round 1, then fixed
    assert(got(7L) === 150000000L)
  }

  test("duplicate edge rows do not double-count (distinct contract)") {
    val once = run(Seq(1L -> 2L, 2L -> 1L), 3)
    val dup = run(Seq(1L -> 2L, 1L -> 2L, 2L -> 1L), 3)
    assert(once === dup)
  }
}
