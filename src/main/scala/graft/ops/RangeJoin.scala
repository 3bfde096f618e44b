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
}
