package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a keyed aggregate table up to
  * date by merging the PARTIAL aggregate of each new delta batch into the
  * previously materialized state, instead of rescanning all history.
  *
  * This is the standard mergeable-aggregate decomposition: every
  * supported measure forms a commutative monoid
  * (count: +, sum: +, min: least, max: greatest), so
  * agg(history ∪ delta) == merge(agg(history), agg(delta)) exactly —
  * which is precisely what the oracle asserts by recomputing the full
  * aggregate from scratch. Non-decomposable measures (exact median,
  * distinct count) are intentionally NOT offered here; the sketch path
  * (approx_distinct_hll) covers those.
  *
  * Scale shape: the delta partial is a map-side-combined groupBy over the
  * delta only; the merge is a groupBy over (|state| + |delta-partial|)
  * pre-aggregated rows — one shuffle on the grouping keys, independent of
  * history size. At 100 TB this turns a daily full-history rescan into
  * work proportional to the day's data.
  */
object IncrementalAgg {

  /** Partial-aggregate `df` by `keys`: n (count), sum/min/max of
    * `valueCol` summed through DECIMAL(18,2) for order-independent
    * exactness. The same shape is the merge input AND the stored state. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "partial aggregation needs at least one key")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }

  /** Distinct-count maintenance via mergeable HLL sketches (DataSketches,
    * bundled with Spark): the state per key is a SKETCH (binary, ~KB at
    * lgK 12), so distinct-count upkeep under daily deltas needs no
    * re-scan of history and no exact distinct set — union of sketches
    * is the monoid merge. Approximate by nature (±~1.6% at lgK 12):
    * tolerance-pinned in IncrementalAggSpec; the exact-distinct path
    * stays `profile`/COUNT(DISTINCT) where exactness is required. */
  def partialDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("hll"))

  /** Merge distinct-count states (each in `partialDistinct` shape). */
  def mergeDistinct(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeDistinct needs at least one state")
    val keys = states.head.columns.filterNot(_ == "hll").toSeq
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(expr("hll_union_agg(hll)").as("hll"))
  }

  /** Read a distinct-count estimate off a sketch state. */
  def estimateDistinct(state: DataFrame): DataFrame =
    state.withColumn("n_distinct_est", expr("hll_sketch_estimate(hll)")).drop("hll")

  /** Merge aggregate states (each in `partial` shape) into one. Monoid
    * per measure: counts and sums add, min/max fold. Accepts any number
    * of states — merge(state, partial(delta)) is the incremental step. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val keys = states.head.columns.filterNot(Set("n", "sum_v", "min_v", "max_v")).toSeq
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}
