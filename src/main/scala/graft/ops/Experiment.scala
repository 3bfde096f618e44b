package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation analytics: the A/B-test data-quality and variance
  * tooling an analytics platform runs over event/exposure logs. Same
  * discipline as the drift family — counts and power sums exact in
  * integers/decimals, the handful of derived doubles computed from
  * those exact sums by one fixed expression tree (bit-identical in any
  * engine), outputs micro/nano-quantized.
  */
object Experiment {

  /** Sample-ratio-mismatch (SRM) check — the first gate any experiment
    * readout must pass: do the arm sizes match the intended allocation?
    * A mismatched ratio means broken bucketing/logging and invalidates
    * the experiment regardless of its metrics (the classic silent
    * killer: a crash that drops one arm's events). χ² goodness-of-fit
    * against integer allocation weights, each arm's cell
    * (o·W − n·w)² / (n·w·W) quantized by the exact decimal(38,0)
    * floor-divmod split — no float in the statistic. Arms observed in
    * the data but absent from `weights` fail loud (an unknown arm IS
    * the bug); declared arms with zero observations surface with their
    * full expected mass.
    *
    * Plan shape: one grouped count (map-side combined, arm-cardinality
    * sized), a literal weight spine, one broadcast total.
    *
    * Output: one row per declared arm —
    * (arm, n_obs, expected_micro, srm_cell_micro); Σ srm_cell_micro is
    * χ²·10^6 with |arms|−1 degrees of freedom. */
  def srmCheck(df: DataFrame, armCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"allocation weights must be positive, got $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val wTot = weights.map(_._2).sum
    val counts = df.select(col(armCol).cast("string").as("arm"))
      .groupBy("arm").agg(count(lit(1)).as("n_obs"))
    val known = weights.map(_._1).toSet
    val unknown = counts.filter(!col("arm").isin(known.toSeq: _*))
      .select("arm").collect().map(_.getString(0))
    require(unknown.isEmpty,
      s"arms observed but not declared in the allocation: ${unknown.mkString(", ")}")
    val spine = weights.toDF("arm", "w")
    val filled = spine.join(counts, Seq("arm"), "left")
      .select(col("arm"), col("w"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val tot = filled.agg(sum("n_obs").as("n"))
    val j = filled.crossJoin(broadcast(tot))
    // e = n·w/W exactly; cell = (o·W − n·w)²/(n·w·W), both as the
    // divmod micro split so the oracle replays bit-for-bit
    val eNum = col("n").cast(dec) * col("w")
    val d = col("n_obs").cast(dec) * wTot - eNum
    val den = eNum * wTot
    j.select(col("arm"), col("n_obs"),
      (call_function("div", eNum * lit(1000000L), lit(wTot).cast(dec)))
        .cast("long").as("expected_micro"),
      when(col("n") > 0L,
        call_function("div", d * d * lit(1000000L), den).cast("long"))
        .as("srm_cell_micro"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — adjust each unit's
    * metric with a pre-experiment covariate so the arm comparison runs
    * on residuals: y_adj = y − θ·(x − x̄) with θ = cov(x, y)/var(x).
    * The workhorse of online experimentation: same means, far tighter
    * intervals when x predicts y.
    *
    * θ and x̄ derive from EXACT micro-int power sums (n, Σx, Σy, Σxy,
    * Σx²) in one map-side-combined aggregation — the groupedOls
    * discipline, so the doubles are bit-identical in any engine — and
    * broadcast back onto the rows: one scan + one broadcast join.
    * Rows with a NULL metric or covariate pass through with NULL
    * adjustment (they contribute nothing to the sums); a
    * zero-variance covariate makes θ undefined → NULL adjustments
    * (the covariate carries no information, the signal to drop it).
    *
    * Output: input columns plus `theta_micro` (the shared θ, on every
    * row for self-describing downstream use) and `y_adj_micro`. */
  def cuped(df: DataFrame, metricCol: String,
      covariateCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val yM = round(col(metricCol).cast("double") * lit(1000000L)).cast("long")
    val xM = round(col(covariateCol).cast("double") * lit(1000000L)).cast("long")
    val stats = df
      .filter(col(metricCol).isNotNull && col(covariateCol).isNotNull)
      .agg(count(lit(1L)).as("__n"),
        sum(xM.cast(dec)).as("__sx"), sum(yM.cast(dec)).as("__sy"),
        sum(xM.cast(dec) * yM).as("__sxy"),
        sum(xM.cast(dec) * xM).as("__sxx"))
    val nD = col("__n").cast("double")
    val mx = col("__sx").cast("double") / nD
    val my = col("__sy").cast("double") / nD
    val covXY = col("__sxy").cast("double") / nD - mx * my
    val varX = col("__sxx").cast("double") / nD - mx * mx
    val theta = covXY / varX
    df.crossJoin(broadcast(stats))
      .withColumn("theta_micro",
        when(col("__n") > 1L && varX > 0.0,
          round(theta * lit(1000000L)).cast("long")))
      .withColumn("y_adj_micro",
        when(col(metricCol).isNotNull && col(covariateCol).isNotNull &&
          col("__n") > 1L && varX > 0.0,
          round(yM.cast("double") - theta * (xM.cast("double") - mx))
            .cast("long")))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx")
  }

  /** Split conformal prediction intervals (Vovk et al. 2005; Lei et al.
    * 2018, "Distribution-Free Predictive Inference for Regression"):
    * given a CALIBRATION frame of (prediction, actual) and a TEST frame
    * of predictions, emit ŷ ± q̂ where q̂ is the k-th smallest absolute
    * calibration residual with k = ⌈(n+1)(1−α)⌉ — finite-sample
    * marginal coverage P(y ∈ interval) ≥ 1−α for exchangeable data,
    * with NO distributional assumption. The model-agnostic uncertainty
    * wrapper every scored-output pipeline can afford.
    *
    * Exactness: predictions/actuals micro-quantize first (floor(x·1e6
    * + 0.5), the quantizeInt8 discipline), residuals are exact int64,
    * k comes from exact integer ceil-division, and q̂ is an exact order
    * statistic off a distinct-residual histogram + cumulative window
    * (the weightedQuantileFromState topology; cells are distinct
    * residual magnitudes — calibration sets are bounded by
    * construction in split conformal, so one cell partition is the
    * right plan; a corpus-sized calibration would swap in the ksDrift
    * range-partition discipline). q̂/n/k resolve to ONE control-plane
    * row collected at build (the bloom-TVF precedent) and ride the
    * test projection as literals — zero shuffle on the test side.
    *
    * Fail-loud: k > n (calibration too small for the requested α —
    * n ≥ ⌈1/α⌉ − 1 is the Lei et al. minimum) throws rather than
    * emitting a silently-infinite interval.
    *
    * Output: test rows + (pred_micro, qhat_micro, lo_micro, hi_micro).
    */
  def conformalIntervals(calib: DataFrame, test: DataFrame,
      predCol: String, actualCol: String,
      alphaMicro: Long = 100000L, idCol: String = "id"): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    conformalFromHistogram(
      conformalResidualHistogram(calib, predCol, actualCol),
      test, predCol, alphaMicro, idCol)
  }

  private def microCol(c: org.apache.spark.sql.Column) =
    floor(c.cast("double") * 1000000L + 0.5).cast("long")

  /** The conformal machinery's mergeable state: (r, c) counts per
    * distinct micro-int absolute residual — a plain count monoid, so
    * per-batch/per-day histograms union into [[conformalFromHistogram]]
    * without re-scoring history (the tClosenessCellState discipline). */
  def conformalResidualHistogram(calib: DataFrame, predCol: String,
      actualCol: String): DataFrame = calib
    .filter(col(predCol).isNotNull && col(actualCol).isNotNull)
    .select(abs(microCol(col(predCol)) - microCol(col(actualCol))).as("r"))
    .groupBy("r").agg(count(lit(1)).as("c"))

  /** Intervals off a residual-histogram state frame —
    * [[conformalIntervals]] routes through here, so direct and
    * from-state intervals are one code path. Duplicate residual cells
    * from unioned state shards sum first. */
  def conformalFromHistogram(histIn: DataFrame, test: DataFrame,
      predCol: String, alphaMicro: Long = 100000L,
      idCol: String = "id"): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    val M = 1000000L
    val hist = histIn.groupBy("r").agg(sum("c").as("c"))
    val win = org.apache.spark.sql.expressions.Window.orderBy("r")
      .rowsBetween(Long.MinValue, 0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val dec = "decimal(38,0)"
    val qRow = hist
      .withColumn("cum", sum("c").over(win))
      .withColumn("n", sum("c").over(all))
      .withColumn("k", call_function("div",
        (col("n").cast(dec) + 1L) * lit(M - alphaMicro) + lit(M - 1L), lit(M))
        .cast("long"))
      .filter(col("cum") >= col("k"))
      .agg(min("r").as("qhat"), max("n").as("n"), max("k").as("k"))
      .collect() // ONE row: (qhat, n, k) — control-plane by design
    val (qhat, n, k) = qRow.headOption match {
      case Some(row) if !row.isNullAt(0) =>
        (row.getLong(0), row.getLong(1), row.getLong(2))
      case _ => throw new IllegalStateException(
        "conformal calibration is empty or too small for alpha: " +
          s"need n >= ceil(1/alpha) - 1 residuals (alphaMicro=$alphaMicro)")
    }
    require(k <= n, s"unreachable: k=$k > n=$n survived the cumulative filter")
    test.select(col(idCol), microCol(col(predCol)).as("pred_micro"))
      .withColumn("qhat_micro", lit(qhat))
      .withColumn("lo_micro", col("pred_micro") - qhat)
      .withColumn("hi_micro", col("pred_micro") + qhat)
  }

  /** Mondrian (group-conditional) split conformal (Vovk 2005 §4.5;
    * "Mondrian conformal prediction"): [[conformalIntervals]]'s
    * marginal guarantee averages over the population — a segment with
    * noisier predictions silently under-covers while an easy segment
    * over-covers. Calibrating q̂ PER GROUP restores the guarantee
    * within every segment: coverage ≥ 1−α conditional on the group.
    *
    * Fully distributed (no driver collect, unlike the global face): one
    * grouped residual histogram, one group-partitioned cumulative
    * window over distinct-residual cells, and ONE broadcast join of the
    * groups-sized q̂ frame onto the test rows. Groups whose calibration
    * is too small for α (k > n) get NULL bounds — per-group fail-soft
    * where the global face fails loud, because one thin segment must
    * not sink every other segment's intervals (the NULL surfaces the
    * gap to route around, the quantileBinsDiscrete contract).
    *
    * Output: test rows + (pred_micro, qhat_micro, lo_micro, hi_micro),
    * NULLs for uncalibratable groups. */
  def conformalIntervalsByGroup(calib: DataFrame, test: DataFrame,
      groupCol: String, predCol: String, actualCol: String,
      alphaMicro: Long = 100000L, idCol: String = "id"): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    val M = 1000000L
    val hist = calib
      .filter(col(predCol).isNotNull && col(actualCol).isNotNull)
      .select(col(groupCol).as("__g"),
        abs(microCol(col(predCol)) - microCol(col(actualCol))).as("r"))
      .groupBy("__g", "r").agg(count(lit(1)).as("c"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("__g").orderBy("r").rowsBetween(Long.MinValue, 0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy("__g")
    val dec = "decimal(38,0)"
    val qhats = hist
      .withColumn("cum", sum("c").over(win))
      .withColumn("n", sum("c").over(all))
      .withColumn("k", call_function("div",
        (col("n").cast(dec) + 1L) * lit(M - alphaMicro) + lit(M - 1L), lit(M))
        .cast("long"))
      .filter(col("cum") >= col("k")) // empty for k > n groups -> NULL via left join
      .groupBy("__g").agg(min("r").as("qhat_micro"))
    test.select(col(idCol), col(groupCol), microCol(col(predCol)).as("pred_micro"))
      .join(broadcast(qhats), col(groupCol) === col("__g"), "left")
      .select(col(idCol), col(groupCol), col("pred_micro"), col("qhat_micro"),
        (col("pred_micro") - col("qhat_micro")).as("lo_micro"),
        (col("pred_micro") + col("qhat_micro")).as("hi_micro"))
  }
}
