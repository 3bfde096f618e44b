package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Materialize

/** Damped PageRank over a directed edge list, in EXACT integer
  * arithmetic — the graph-centrality primitive for corpus curation
  * (authority-weighting a link graph, picking canonical docs inside
  * dedup clusters, weighting hosts in a crawl frontier).
  *
  * Engine-portability contract: ranks are scaled 64-bit integers
  * (initial mass `r0` per node). Each round every node sends
  * floor(rank / out_degree) along each out-edge, and new ranks are
  * base + floor(85% of inbound mass) — all floor divisions of
  * positive integers, so every engine that implements the same
  * recurrence produces bit-identical BIGINTs (the DuckDB oracle runs
  * it as a recursive CTE). No float appears anywhere; the rounding
  * mass lost to floors is part of the recurrence's definition, not an
  * error term.
  *
  * Dangling-node convention: nodes with no out-edges send nothing
  * (their mass evaporates); nodes with no in-edges are kept alive by a
  * zero-weight self-loop so the iteration frame always carries one row
  * per node. Both conventions are mirrored in the oracle.
  *
  * Scale shape: one join + one aggregation per round, both shuffling
  * on node id; ranks are re-materialized each round ([[Materialize]]:
  * reliable checkpoint under a configured checkpoint dir) so lineage
  * stays flat on a 1000-executor run. Overflow headroom: worst-case
  * inbound mass per node is the whole graph's, n_nodes * r0, so keep
  * n_nodes * r0 * 85 < 2^63 (with the default r0 = 10^9 that allows
  * ~10^8 nodes; shrink r0 for bigger graphs).
  */
object PageRank {

  def run(edges: DataFrame, iterations: Int = 5, r0: Long = 1000000000L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val nodes = Materialize(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    val deg = Materialize(e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d")))
    // zero-weight self-loops keep no-inbound nodes in the frame, so the
    // per-round aggregation alone preserves the full node set
    val eplus =
      e.select(col("src"), col("dst"), lit(1L).as("w"))
        .union(nodes.select(col("node").as("src"), col("node").as("dst"), lit(0L).as("w")))
    // out-degree is STATIC: fold it into the edge list once instead of
    // re-joining deg against the rank frame every round — one join per
    // iteration instead of two
    val ed = Materialize(eplus
      .join(deg.select(col("node").as("src"), col("d")), Seq("src"), "left")
      .select(col("src"), col("dst"), col("w"), coalesce(col("d"), lit(1L)).as("d")))

    var ranks = Materialize(nodes.select(col("node"), lit(r0).as("rank")))
    for (_ <- 1 to iterations) {
      ranks = Materialize(
        ranks.join(ed, col("node") === col("src"))
          .groupBy(col("dst").as("node2"))
          .agg(sum(expr("(rank div d) * w")).as("s"))
          .select(col("node2").as("node"),
            (lit(base) + expr("(85 * s) div 100")).as("rank")))
    }
    ranks
  }
}
