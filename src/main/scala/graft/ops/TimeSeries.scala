package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed step grid per key, filling interior gaps by linear
  * interpolation between the nearest observed buckets.
  *
  * Plan shape (three stages, one partitioning reused):
  *  1. observed buckets: groupBy (key, bucket) — the only full shuffle,
  *     on the same composite key the later join uses;
  *  2. per-key grid: groupBy key for (min, max) then
  *     `explode(sequence(...))` — generation is a zero-shuffle Expand
  *     over one row per key, never a driver loop;
  *  3. interpolation: two window passes over the SAME key partitioning
  *     (last/first with ignoreNulls), so no extra exchange beyond the
  *     windows' sort.
  * The grid is bounded by each key's own observed span (no global-span
  * blowup for short-lived keys), and endpoints are observed by
  * construction so interior interpolation is always well-defined.
  * At 100 TB the dominant cost stays the one groupBy shuffle; grid rows
  * are O(span/step) per key and never materialize on the driver.
  */
object TimeSeries {

  /** Resample `df` to a `step`-second grid per `keyCol`. `tsSecCol` is an
    * epoch-seconds column; `valueExpr` is summed per bucket through
    * DECIMAL(18,6) for order-independent exactness, surfaced as DOUBLE.
    * Output: key, bucket (epoch seconds), `v` (observed-or-interpolated),
    * `observed` flag. */
  def gapFillInterpolate(df: DataFrame, keyCol: String, tsSecCol: String,
      valueCol: String, step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val bucket = (col(tsSecCol) - pmod(col(tsSecCol), lit(step))).as("bucket")
    val obs = df
      .select(col(keyCol), bucket, col(valueCol).cast("decimal(18,6)").as("dv"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(sum(col("dv")).cast("double").as("obs_v"))

    val grid = obs
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), lit(step))).as("bucket"))

    val joined = grid.join(obs, Seq(keyCol, "bucket"), "left")

    val wPrev = Window.partitionBy(keyCol).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(col("obs_v"), ignoreNulls = true).over(wPrev)
    val prevT = last(when(col("obs_v").isNotNull, col("bucket")), ignoreNulls = true).over(wPrev)
    val nextV = first(col("obs_v"), ignoreNulls = true).over(wNext)
    val nextT = first(when(col("obs_v").isNotNull, col("bucket")), ignoreNulls = true).over(wNext)

    // linear interpolation, exactly mirrored by the oracle's SQL: the
    // products and the single division run in DOUBLE with this precise
    // association, so both engines execute the identical IEEE ops
    val interp = col("pv") +
      (col("nv") - col("pv")) *
        ((col("bucket") - col("pt")).cast("double") / (col("nt") - col("pt")).cast("double"))

    joined
      .select(col(keyCol), col("bucket"), col("obs_v"),
        prevV.as("pv"), prevT.as("pt"), nextV.as("nv"), nextT.as("nt"))
      .select(col(keyCol), col("bucket"),
        when(col("obs_v").isNotNull, col("obs_v")).otherwise(interp).as("v"),
        col("obs_v").isNotNull.as("observed"))
  }
}
