package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cube materialization + aggregate navigation — the OLAP pattern of
  * computing every grouping-set marginal ONCE and answering coarser
  * aggregates from the materialized cube instead of re-scanning the
  * base table.
  *
  * `materializeCube` runs one CUBE aggregation (a single Expand + one
  * exchange, 2^d grouping sets) with `grouping_id()` tagging each
  * output row's set. `fromCube` then answers "GROUP BY subset" queries
  * by FILTERING the cube on the subset's grouping-id mask — no
  * re-aggregation at all, because the cube row set for that mask IS
  * the requested aggregate. At 100 TB that turns every dashboard
  * drill-down after the first from a full scan into a lookup on a
  * 2^d·|domain| row table.
  *
  * Sums run through DECIMAL so cube rows are exact and navigation
  * returns bit-identical answers to a direct GROUP BY (which is what
  * the oracle asserts).
  */
object CubeNav {

  /** One pass: every marginal of `dims` with exact decimal sums.
    * Output: dims ++ (gid, n_rows, sum_v). */
  def materializeCube(df: DataFrame, dims: Seq[String], valueCol: String): DataFrame = {
    require(dims.nonEmpty && dims.size <= 10, "1..10 cube dimensions")
    df.cube(dims.map(col): _*)
      .agg(grouping_id().as("gid"), count(lit(1L)).as("n_rows"),
        sum(col(valueCol).cast("decimal(27,6)")).as("sum_v"))
  }

  /** Answer GROUP BY `selectDims` from a materialized cube: filter on
    * the grouping-id whose bits mark exactly the dims AGGREGATED AWAY
    * (bit i set ⇔ dims(i) rolled up; bit 0 is the LAST cube dim). */
  def fromCube(cubeTable: DataFrame, dims: Seq[String],
      selectDims: Seq[String]): DataFrame = {
    val unknown = selectDims.filterNot(dims.contains)
    require(unknown.isEmpty, s"not cube dimensions: $unknown")
    val mask = dims.zipWithIndex
      .filterNot { case (d, _) => selectDims.contains(d) }
      .map { case (_, i) => 1L << (dims.size - 1 - i) }.sum
    cubeTable.filter(col("gid") === lit(mask))
      .select((selectDims.map(col) :+ col("n_rows")) :+ col("sum_v"): _*)
  }
}
