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

  /** The distinct node frame of an edge list. */
  private def nodeFrame(e: DataFrame): DataFrame = Materialize(
    e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())

  /** The canonical distinct edge list, MATERIALIZED once: it feeds the
    * node frame, the degree count and the self-loop union (three
    * consumers — an unfenced distinct would re-shuffle the whole edge
    * list for each, the triangleCounts lesson). */
  private def edgeFrame(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = Materialize(
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())

  /** The static per-edge frame the rounds iterate on: zero-weight
    * self-loops keep no-inbound nodes in the frame (so the per-round
    * aggregation alone preserves the full node set), and out-degree is
    * STATIC so it folds into the edge list once instead of re-joining
    * against the rank frame every round — one join per iteration
    * instead of two. `deg` is consumed exactly once (by the fold-in
    * join) off the already-checkpointed edge list, so it carries no
    * fence of its own. Returns (static, deg) — deg is node-sized and
    * rides along so [[runWithState]] can persist it for
    * [[resumeDelta]]'s degree patching. */
  private def staticEdges(e: DataFrame, nodes: DataFrame): (DataFrame, DataFrame) = {
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val eplus =
      e.select(col("src"), col("dst"), lit(1L).as("w"))
        .union(nodes.select(col("node").as("src"), col("node").as("dst"), lit(0L).as("w")))
    (Materialize(eplus
      .join(deg.select(col("node").as("src"), col("d")), Seq("src"), "left")
      .select(col("src"), col("dst"), col("w"), coalesce(col("d"), lit(1L)).as("d"))),
      deg)
  }

  /** `iterations` rounds of the integer recurrence from an arbitrary
    * starting rank frame — the shared engine of [[run]] and
    * [[resume]]. Ranks re-materialize each round so lineage stays
    * flat on a 1000-executor run. */
  private def iterate(ed: DataFrame, ranks0: DataFrame, iterations: Int,
      base: Long): DataFrame = {
    var ranks = ranks0
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

  def run(edges: DataFrame, iterations: Int = 5, r0: Long = 1000000000L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100

    val e = edgeFrame(edges, srcCol, dstCol)
    val nodes = nodeFrame(e)
    val (ed, _) = staticEdges(e, nodes)
    // no fence on ranks0: a trivial projection of the already-
    // checkpointed node frame with exactly one consumer (round 1's
    // join) — the fence only added an eager checkpoint job
    iterate(ed, nodes.select(col("node"), lit(r0).as("rank")),
      iterations, base)
  }

  /** [[run]] that ALSO returns the graph state a delta batch needs:
    * (ranks, static, deg) where `static` is the self-loop-extended
    * degree-folded edge frame the rounds iterated on and `deg` the
    * node-sized out-degree frame. Persist all three and hand them to
    * [[resumeDelta]] — then a later delta batch never re-shuffles the
    * base graph (the full union rebuild that [[resume]] pays). */
  def runWithState(edges: DataFrame, iterations: Int = 5,
      r0: Long = 1000000000L, srcCol: String = "src", dstCol: String = "dst")
      : (DataFrame, DataFrame, DataFrame) = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100
    val e = edgeFrame(edges, srcCol, dstCol)
    val nodes = nodeFrame(e)
    val (ed, deg) = staticEdges(e, nodes)
    (iterate(ed, nodes.select(col("node"), lit(r0).as("rank")),
      iterations, base), ed, deg)
  }

  /** Everything [[resumeDelta]] patches against the persisted static
    * frame, shared with [[resumeDeltaPersonalized]]: the genuinely new
    * (not-in-base) canonical delta edges, the brand-new nodes, the
    * degree-patched rows for every src a new edge touches, and the
    * untouched remainder of the static frame. The CONTRACT is that the
    * delta batch is dimension-sized (broadcastable): every base-side
    * frame is only SCANNED against a broadcast of a delta-derived
    * frame — the base graph is never shuffled. Self-loop rows keep
    * their stored `d` even when a degree changed: with w = 0 the
    * round contribution (rank div d)·w is zero whatever d is, so only
    * w = 1 rows need the patched degree. */
  private def deltaPatch(static0: DataFrame, deg0: DataFrame,
      deltaEdges: DataFrame, srcCol: String, dstCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val dEdges = deltaEdges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val baseReal = static0.filter(col("w") === 1L).select(col("src"), col("dst"))
    // delta-minus-base without shuffling the base: stream the base scan
    // against the broadcast delta to find already-present pairs, then
    // subtract that (delta-sized) hit set from the delta
    val present = baseReal.join(broadcast(dEdges), Seq("src", "dst"), "left_semi")
    val newE = Materialize(
      dEdges.join(broadcast(present), Seq("src", "dst"), "left_anti"))
    val changedSrc = newE.select(col("src")).distinct()
    // brand-new nodes: endpoints of new edges absent from the base node
    // set (= static0's one-self-loop-per-node rows)
    val baseNodes = static0.filter(col("w") === 0L).select(col("src").as("node"))
    val newNodeCand = newE.select(col("src").as("node"))
      .union(newE.select(col("dst").as("node"))).distinct()
    val nodePresent = baseNodes.join(broadcast(newNodeCand), Seq("node"), "left_semi")
    val newNodes = Materialize(
      newNodeCand.join(broadcast(nodePresent), Seq("node"), "left_anti"))
    // out-degrees change exactly on new-edge srcs: patched d = stored + new
    val degDelta = newE.groupBy(col("src").as("node")).agg(count(lit(1)).as("dd"))
    val degChangedVals = deg0.join(broadcast(degDelta.select(col("node"))),
      Seq("node"), "left_semi")
    val degNew = degDelta.join(degChangedVals, Seq("node"), "left")
      .select(col("node"), (coalesce(col("d"), lit(0L)) + col("dd")).as("d"))
    // rebuilt w=1 rows: the changed srcs' base edges + the new edges,
    // re-folded against the patched degrees
    val changedB = broadcast(changedSrc.withColumn("__c", lit(1)))
    val baseChangedReal = static0.filter(col("w") === 1L)
      .join(broadcast(changedSrc), Seq("src"), "left_semi")
      .select(col("src"), col("dst"))
    val rebuiltReal = baseChangedReal.union(newE)
      .join(broadcast(degNew.select(col("node").as("src"), col("d"))), Seq("src"))
      .select(col("src"), col("dst"), lit(1L).as("w"), col("d"))
    // one scan keeps everything except the w=1 rows being rebuilt
    val untouched = static0.join(changedB, Seq("src"), "left")
      .filter(col("w") === 0L || col("__c").isNull)
      .select(col("src"), col("dst"), col("w"), col("d"))
    (newNodes, degNew, rebuiltReal, untouched)
  }

  /** [[resume]] against PERSISTED GRAPH STATE — the delta-shaped fast
    * path: instead of rebuilding the canonical edge/node/degree frames
    * from the full base ∪ delta union (three shuffles of the whole
    * graph), PATCH the persisted static frame with the delta:
    * broadcast-dedup the delta against a base scan, rebuild only the
    * rows whose src gained an edge, keep the untouched remainder
    * verbatim, append self-loops for brand-new nodes (entering at
    * `r0`), and run `iterations` more rounds of the identical
    * recurrence. Bit-identical to [[resume]] over the same inputs by
    * construction (same canonical frames, same recurrence — the
    * driver's oracle replays the same two-phase recursive CTE).
    * Contract: the delta batch is dimension-sized (broadcastable);
    * for bulk loads comparable to the base graph, use [[resume]]. */
  def resumeDelta(static0: DataFrame, deg0: DataFrame, state: DataFrame,
      deltaEdges: DataFrame, iterations: Int = 2, r0: Long = 1000000000L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100
    val (newNodes, degNew, rebuiltReal, untouched) =
      deltaPatch(static0, deg0, deltaEdges, srcCol, dstCol)
    val newSelfLoops = newNodes
      .join(degNew, Seq("node"), "left")
      .select(col("node").as("src"), col("node").as("dst"), lit(0L).as("w"),
        coalesce(col("d"), lit(1L)).as("d"))
    val ed = Materialize(untouched.union(rebuiltReal).union(newSelfLoops))
    // single consumer (round 1) over a parquet state scan + checkpointed
    // newNodes — no fence needed
    val ranks0 = state.select(col("node"), col("rank"))
      .union(newNodes.select(col("node"), lit(r0).as("rank")))
    iterate(ed, ranks0, iterations, base)
  }

  /** Resume PageRank from PERSISTED rank state after a delta edge
    * batch lands — the incremental-maintenance face of [[run]] (the
    * `ops/IncrementalAgg` discipline applied to the bench's most
    * expensive family): instead of re-running the full schedule from
    * uniform init, seed the rank frame from the stored (node, rank)
    * rows — brand-new nodes enter at `r0` — and run `iterations`
    * MORE rounds of the identical recurrence over the full
    * (base ∪ delta) edge list. Degrees and self-loops are REBUILT
    * from the union (a recount, never stored stale — a delta edge
    * changes its endpoints' out-degrees, so stored degrees would
    * corrupt every incident floor division).
    *
    * By construction this equals running the same two-phase schedule
    * in one session (k rounds on the base graph, then j on the
    * union), which is exactly what the DuckDB oracle replays as two
    * chained recursive CTEs — so the incremental driver row proves
    * the state round-trip through the parquet sink, bit-exactly.
    * Cost: each resume round is [[run]]'s one join + one aggregation;
    * the savings is the k base rounds that never re-run. */
  def resume(edges: DataFrame, state: DataFrame, iterations: Int = 2,
      r0: Long = 1000000000L, srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100

    val e = edgeFrame(edges, srcCol, dstCol)
    val nodes = nodeFrame(e)
    val (ed, _) = staticEdges(e, nodes)
    val ranks0 = nodes
      .join(state.select(col("node"), col("rank").as("__stored")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__stored"), lit(r0)).as("rank"))
    iterate(ed, ranks0, iterations, base)
  }

  /** Personalized PageRank: identical recurrence and conventions as
    * [[run]], but the initial mass AND the per-round 15% teleport base
    * live ONLY on the seed set — rank measures proximity to the seeds
    * (the random surfer restarts at a seed, never at an arbitrary
    * node). The topical-authority primitive of corpus curation: score
    * a crawl or link graph by closeness to a trusted/domain seed list.
    * Seeds absent from the graph are ignored; with seeds = all nodes
    * the recurrence degenerates to exactly [[run]].
    *
    * Scale shape: the seed flag is folded into the static edge frame
    * once (seed lists are dimension-sized — broadcast), so each round
    * is still ONE join + ONE aggregation; the flag rides the
    * aggregation as a constant-per-group max. Integer-exactness and
    * the dangling/self-loop conventions are [[run]]'s verbatim, so the
    * DuckDB recursive-CTE oracle differs only in two seed CASEs. */
  def personalized(edges: DataFrame, seeds: DataFrame, iterations: Int = 5,
      r0: Long = 1000000000L, srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100
    val e = edgeFrame(edges, srcCol, dstCol)
    val (flagged, ed, _) = personalizedStatic(e, seeds)
    iteratePersonalized(ed,
      flagged.select(col("node"), (col("is_seed") * lit(r0)).as("rank")),
      iterations, base)
  }

  /** [[personalized]] that ALSO returns (ranks, static, deg) so a
    * delta batch can go through [[resumeDeltaPersonalized]] without
    * re-shuffling the base graph — [[runWithState]]'s contract with
    * the seed flag riding the static frame. */
  def personalizedWithState(edges: DataFrame, seeds: DataFrame,
      iterations: Int = 5, r0: Long = 1000000000L, srcCol: String = "src",
      dstCol: String = "dst"): (DataFrame, DataFrame, DataFrame) = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100
    val e = edgeFrame(edges, srcCol, dstCol)
    val (flagged, ed, deg) = personalizedStatic(e, seeds)
    (iteratePersonalized(ed,
      flagged.select(col("node"), (col("is_seed") * lit(r0)).as("rank")),
      iterations, base), ed, deg)
  }

  /** The static frames [[personalized]] iterates on: the seed-flagged
    * node frame and the self-loop-extended edge frame with out-degree
    * AND the dst's seed flag folded in once (seed lists are
    * dimension-sized — broadcast) — each round stays one join + one
    * aggregation; the flag rides the aggregation as a
    * constant-per-group max. */
  private def personalizedStatic(e: DataFrame, seeds: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val nodes = nodeFrame(e)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val seedSet = broadcast(
      seeds.select(col(seeds.columns.head).as("node")).distinct()
        .withColumn("__s", lit(1L)))
    val flagged = Materialize(nodes.join(seedSet, Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("is_seed")))
    val eplus =
      e.select(col("src"), col("dst"), lit(1L).as("w"))
        .union(nodes.select(col("node").as("src"), col("node").as("dst"), lit(0L).as("w")))
    val ed = Materialize(eplus
      .join(deg.select(col("node").as("src"), col("d")), Seq("src"), "left")
      .join(flagged.select(col("node").as("dst"), col("is_seed").as("ds")), Seq("dst"))
      .select(col("src"), col("dst"), col("w"),
        coalesce(col("d"), lit(1L)).as("d"), col("ds")))
    (flagged, ed, deg)
  }

  private def iteratePersonalized(ed: DataFrame, ranks0: DataFrame,
      iterations: Int, base: Long): DataFrame = {
    var ranks = ranks0
    for (_ <- 1 to iterations) {
      ranks = Materialize(
        ranks.join(ed, col("node") === col("src"))
          .groupBy(col("dst").as("node2"))
          .agg(sum(expr("(rank div d) * w")).as("s"), max(col("ds")).as("isd"))
          .select(col("node2").as("node"),
            (col("isd") * lit(base) + expr("(85 * s) div 100")).as("rank")))
    }
    ranks
  }

  /** Personalized-PageRank warm-start resumption — [[resume]]'s
    * discipline applied to [[personalized]]: stored (node, rank) state
    * seeds the rank frame (delta-born nodes enter at is_seed·r0 — the
    * personalized init, so a brand-new non-seed node starts at zero
    * mass exactly as a one-session schedule would have it), degrees,
    * self-loops and seed flags are REBUILT over the full base ∪ delta
    * edge list, and `iterations` more rounds of the identical
    * seed-based recurrence run. Equals the one-session two-phase
    * schedule by construction; the oracle replays it as chained
    * recursive CTEs with the seed CASEs. */
  /** [[resumeDelta]]'s delta-shaped fast path for the personalized
    * recurrence: patch the persisted seed-flagged static frame with
    * the delta batch (the [[deltaPatch]] machinery — base graph
    * scanned, never shuffled), re-deriving the `ds` flag of rebuilt
    * rows and the seed state of brand-new nodes from the broadcast
    * seed set (flags are seed-membership facts, independent of the
    * base graph). Brand-new nodes enter at is_seed·r0 — exactly the
    * personalized init. Bit-identical to [[resumePersonalized]] over
    * the same inputs; same dimension-sized-delta contract. */
  def resumeDeltaPersonalized(static0: DataFrame, deg0: DataFrame,
      state: DataFrame, deltaEdges: DataFrame, seeds: DataFrame,
      iterations: Int = 2, r0: Long = 1000000000L, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100
    val seedSet = broadcast(
      seeds.select(col(seeds.columns.head).as("node")).distinct()
        .withColumn("__s", lit(1L)))
    val (newNodes, degNew, rebuiltRealBare, untouched) =
      deltaPatch(static0.select(col("src"), col("dst"), col("w"), col("d")),
        deg0, deltaEdges, srcCol, dstCol)
    // the plain-variant patch drops `ds`; re-derive it for rebuilt and
    // new rows from seed membership, and re-attach the stored flag to
    // the untouched remainder via the one scan's own columns
    val untouchedP = static0.join(
      broadcast(rebuiltRealBare.select(col("src")).distinct().withColumn("__c", lit(1))),
      Seq("src"), "left")
      .filter(col("w") === 0L || col("__c").isNull)
      .select(col("src"), col("dst"), col("w"), col("d"), col("ds"))
    val rebuiltP = rebuiltRealBare
      .join(seedSet.select(col("node").as("dst"), col("__s")), Seq("dst"), "left")
      .select(col("src"), col("dst"), col("w"), col("d"),
        coalesce(col("__s"), lit(0L)).as("ds"))
    val newFlagged = Materialize(newNodes.join(seedSet, Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("is_seed")))
    val newSelfLoops = newFlagged
      .join(degNew, Seq("node"), "left")
      .select(col("node").as("src"), col("node").as("dst"), lit(0L).as("w"),
        coalesce(col("d"), lit(1L)).as("d"), col("is_seed").as("ds"))
    val ed = Materialize(untouchedP.union(rebuiltP).union(newSelfLoops))
    val ranks0 = state.select(col("node"), col("rank"))
      .union(newFlagged.select(col("node"), (col("is_seed") * lit(r0)).as("rank")))
    iteratePersonalized(ed, ranks0, iterations, base)
  }

  def resumePersonalized(edges: DataFrame, seeds: DataFrame,
      state: DataFrame, iterations: Int = 2, r0: Long = 1000000000L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(r0 % 20 == 0, s"r0 must be divisible by 20 so the 15% base term is exact, got $r0")
    val base = 15L * r0 / 100
    val e = edgeFrame(edges, srcCol, dstCol)
    val (flagged, ed, _) = personalizedStatic(e, seeds)
    val ranks0 = flagged
      .join(state.select(col("node"), col("rank").as("__stored")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__stored"), col("is_seed") * lit(r0)).as("rank"))
    iteratePersonalized(ed, ranks0, iterations, base)
  }
}
