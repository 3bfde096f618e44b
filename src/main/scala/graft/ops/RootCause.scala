package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Root-cause decomposition for metric moves — "revenue dropped 4%
  * between yesterday and today: WHICH dimension explains it?" The
  * Adtributor shape (Bhagwan et al. 2014, public): score every segment
  * of every candidate dimension by its contribution to the
  * between-snapshot delta, then read the answer off the per-dimension
  * frame (the dimension whose few segments carry most of the move is
  * the explanation; a uniform smear across segments is base-rate
  * drift).
  */
object RootCause {

  /** Per-(dimension, segment) metric deltas between two snapshots, for
    * ALL candidate dimensions in ONE pass: each row Expands to one
    * (dim, segment) tagging per candidate (the rollup/Expand trick —
    * zero-shuffle fan-out, then a single grouped aggregation over the
    * union of every dimension's segment space). Metric values are
    * micro-quantized once and summed as exact integers; NULL segment
    * values are a real segment (sentinel) — a metric moving into the
    * NULL bucket IS a root cause (a logging regression).
    *
    * Snapshots arrive as two frames (tagged-union aggregated, one
    * shuffle — the chi2Drift topology), so "period A vs period B",
    * "control vs treatment", and "yesterday vs today" are all the same
    * call. Output rows scale with Σ per-dimension segment
    * cardinalities, never data.
    *
    * Output: (dim, segment, n_a, n_b, v_a_micro, v_b_micro,
    * delta_micro). */
  def dimensionDeltas(a: DataFrame, b: DataFrame, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty, "need at least one candidate dimension")
    val vM = round(col(valueCol).cast("double") * lit(1000000L)).cast("long")
    def tagged(df: DataFrame, aSide: Boolean): DataFrame = {
      val pairs: Seq[Column] = dims.map { d =>
        struct(lit(d).as("dim"),
          coalesce(col(d).cast("string"), lit("<NULL>")).as("segment"))
      }
      df.filter(col(valueCol).isNotNull)
        .select(explode(array(pairs: _*)).as("ds"), vM.as("v"))
        .select(col("ds.dim").as("dim"), col("ds.segment").as("segment"),
          lit(if (aSide) 1L else 0L).as("one_a"),
          lit(if (aSide) 0L else 1L).as("one_b"),
          (if (aSide) col("v") else lit(0L)).as("v_a"),
          (if (aSide) lit(0L) else col("v")).as("v_b"))
    }
    tagged(a, aSide = true).unionByName(tagged(b, aSide = false))
      .groupBy("dim", "segment")
      .agg(sum("one_a").as("n_a"), sum("one_b").as("n_b"),
        sum("v_a").as("v_a_micro"), sum("v_b").as("v_b_micro"))
      .withColumn("delta_micro", col("v_b_micro") - col("v_a_micro"))
  }
}
