package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN maintenance — keep a materialized equi-join view up
  * to date under insert-only deltas without rejoining the full inputs.
  *
  * Delta algebra for J = A ⋈ B with inserts ΔA, ΔB:
  *   ΔJ = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *   J' = J ∪ ΔJ
  * Exact because join distributes over union and the three terms
  * partition (A∪ΔA)⋈(B∪ΔB) \ A⋈B when A∩ΔA = B∩ΔB = ∅ (insert-only
  * contract — callers feed genuinely new rows; keyed updates compose as
  * CDC delete+insert, with the delete side handled by the caller's
  * retraction anti-join).
  *
  * Scale shape: the expensive A ⋈ B full join never re-runs. Each
  * maintenance term probes a full input with a DELTA-sized side — the
  * deltas are broadcast (`broadcastDeltas`, default on), so maintaining
  * a 100 TB ⋈ 100 TB view costs two broadcast-join scans proportional
  * to the day's inserts plus the tiny ΔA ⋈ ΔB, not a re-shuffle of
  * either input. With co-bucketed inputs, switch broadcastDeltas off
  * and the terms become co-located shuffle joins on the same key.
  */
object IncrementalJoin {

  /** The delta of the join view: rows to APPEND to the materialized
    * J = `aOld` ⋈ `bOld` (inner equi-join on `keys`) so it equals
    * (aOld ∪ aDelta) ⋈ (bOld ∪ bDelta). */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame, bOld: DataFrame,
      bDelta: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs at least one join key")
    def hint(df: DataFrame) = if (broadcastDeltas) broadcast(df) else df
    hint(aDelta).join(bOld, keys)
      .unionByName(aOld.join(hint(bDelta), keys))
      .unionByName(hint(aDelta).join(hint(bDelta), keys))
  }

  /** Maintained view after one delta application. */
  def maintain(view: DataFrame, aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame =
    view.unionByName(
      joinDelta(aOld, aDelta, bOld, bDelta, keys, broadcastDeltas))
}
