package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable range join: points joined to covering intervals.
  *
  * Spark plans a raw `l.ts BETWEEN r.start AND r.end` join (plus key
  * equality) as a sort-merge on keys with a post-filter — fine when keys
  * are selective, catastrophic when a key has many intervals. The
  * bucketized form makes the join equi on (key, time-bucket): intervals
  * explode to the buckets they cover, points hash to exactly one bucket,
  * and the residual BETWEEN filter runs per bucket-collision. Shuffle
  * volume is |points| + Σ interval-widths/bucketWidth — linear, no
  * quadratic key blowup; bucketWidth trades explode factor vs collision
  * rate (set it near the median interval width).
  *
  * A point landing in one bucket meets each covering interval exactly
  * once, so no post-join dedup is needed.
  */
object RangeJoin {

  /** Inner-join each left row (numeric point `tsCol`) to the right rows
    * whose [startCol, endCol] interval covers it (inclusive), with
    * equality on `keys`. All three columns must share the same numeric
    * domain (e.g. epoch seconds). */
  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__graft_bucket", floor(col(tsCol) / bucketWidth))
    val rb = right.withColumn("__graft_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    lb.join(rb, keys :+ "__graft_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__graft_bucket")
  }

  /** Interval × interval overlap join: each left [lStart, lEnd] joined to
    * every right [rStart, rEnd] with a non-empty intersection (inclusive
    * bounds), with equality on `keys`.
    *
    * Both sides explode to their covered buckets, the join is equi on
    * (keys, bucket), and the residual overlap predicate runs per
    * collision. A pair overlapping across MANY shared buckets would
    * duplicate, so each surviving pair is emitted only at its OWNER
    * bucket — the one containing max(lStart, rStart), the overlap's
    * start, which both sides provably cover. Exactly-once without any
    * post-join distinct: dedup at 100 TB would be a second full shuffle
    * of the result; the owner-bucket test is a codegen'd filter.
    *
    * Shuffle volume is Σ widths/bucketWidth on each side — linear in
    * input, never quadratic in key cardinality. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__graft_bucket",
      explode(sequence(floor(col(lStart) / bucketWidth), floor(col(lEnd) / bucketWidth))))
    val rb = right.withColumn("__graft_bucket",
      explode(sequence(floor(col(rStart) / bucketWidth), floor(col(rEnd) / bucketWidth))))
    lb.join(rb, keys :+ "__graft_bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(floor(greatest(col(lStart), col(rStart)) / bucketWidth) === col("__graft_bucket"))
      .drop("__graft_bucket")
  }
}
