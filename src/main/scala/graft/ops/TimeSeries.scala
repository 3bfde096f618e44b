package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Seasonal-baseline volume anomaly: compare each (key, day, hour)
    * cell's event count against the key's SAME-HOUR-OF-DAY baseline
    * across all days — the calendar-aware twin of
    * [[DataQuality.volumeControlChart]]'s global z-rule (Monday-9am
    * traffic is only anomalous against other 9am hours, not against
    * 3am). The test is EXACT integer arithmetic: a cell is anomalous
    * when
    *
    *   n · n_cells · factorDen > factorNum · total
    *
    * (n_cells, total over the key's hour-of-day baseline) — i.e. the
    * cell exceeds (factorNum/factorDen)× its seasonal mean, with the
    * rational threshold cross-multiplied so no float division ever
    * runs: the flagged set is a pure function of the data. Epoch
    * seconds are positive, so integer `div` is floor division on both
    * engines.
    *
    * Output: anomalous cells only — (key, day, hour, n, n_cells,
    * total). Plan: one grouped count on (key, day, hour) (map-side
    * combine), the baseline re-aggregated from those cells (never a
    * second scan), broadcast back over the bounded (key × 24) frame. */
  def seasonalAnomaly(df: DataFrame, secCol: String, keyCol: String,
      factorNum: Long = 3L, factorDen: Long = 2L): DataFrame =
    seasonalAnomalyFromCells(hourCells(df, secCol, keyCol), keyCol,
      factorNum, factorDen)

  /** The (key, day, hour, n) cell counts [[seasonalAnomaly]] tests —
    * exposed because counts are the MONOID a streaming gate persists:
    * day-level (or microbatch-level) cell states re-sum into any
    * window's state without rescanning events. */
  def hourCells(df: DataFrame, secCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol),
        call_function("div", col(secCol), lit(86400L)).as("day"),
        pmod(call_function("div", col(secCol), lit(3600L)), lit(24L)).as("hour"))
      .agg(count(lit(1)).as("n"))

  /** [[seasonalAnomaly]]'s test over a pre-aggregated cells frame
    * (columns: keyCol, day, hour, n) — used directly by the streaming
    * anomaly gate, whose stored state IS this frame. */
  def seasonalAnomalyFromCells(cells: DataFrame, keyCol: String,
      factorNum: Long = 3L, factorDen: Long = 2L): DataFrame = {
    require(factorNum > 0 && factorDen > 0 && factorNum >= factorDen,
      s"threshold factor must be a rational >= 1, got $factorNum/$factorDen")
    val base = cells.groupBy(col(keyCol), col("hour"))
      .agg(count(lit(1)).as("n_cells"), sum("n").as("total"))
    cells.join(broadcast(base), Seq(keyCol, "hour"))
      .filter(col("n") * col("n_cells") * lit(factorDen) > lit(factorNum) * col("total"))
      .select(col(keyCol), col("day"), col("hour"),
        col("n"), col("n_cells"), col("total"))
  }

  /** Per-key autocorrelation at lags 1..`maxLag` over an integer-indexed
    * series (one row per (key, t)). Pairs semantics under gaps: lag-k
    * products run over pairs where BOTH t and t+k are present; mean and
    * variance use the full series. All sums are exact (DECIMAL through
    * the shuffle — order-independent); only the final ratio is floating,
    * surfaced as micro-quantized `acf_micro`:
    *   r_k = Σ_pairs (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    * expanded to A − x̄B − x̄C + m·x̄² over exact sums A=Σx_t·x_{t+k},
    * B=Σx_t, C=Σx_{t+k}, m=#pairs, so no per-row float ever shuffles.
    * Values are quantized to MICRO units up front (exact for 6-decimal
    * inputs) and every sum runs in DECIMAL(38,0) integers — int64 Σx²
    * overflows near 3M-bucket series, and the scale factors cancel in
    * the ratio, so micro² units cost nothing (the kappa/KS overflow
    * lesson). Plan: one groupBy(key) for the totals; a zero-shuffle
    * Expand (explode of the 1..maxLag literal array) then ONE equi-join
    * on (key, t) against the un-exploded side and a groupBy (key, lag) —
    * at 100 TB the cost is maxLag× the series size through one shuffle,
    * never a window over a single partition. */
  def acf(df: DataFrame, keyCol: String, tCol: String, valCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64]: $maxLag")
    val dec = "decimal(38,0)"
    val base = df.select(col(keyCol), col(tCol).cast("long").as("__t"),
      (col(valCol).cast("decimal(18,6)") * lit(1000000L)).cast("long").as("__x"))
    val tot = base.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"), sum(col("__x").cast(dec)).as("__s"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__ss"))
    val lagged = base
      .withColumn("lag", explode(array((1 to maxLag).map(k => lit(k.toLong)): _*)))
      .select(col(keyCol), (col("__t") + col("lag")).as("__t"),
        col("lag"), col("__x").as("__x1"))
    val pairs = lagged.join(base, Seq(keyCol, "__t"))
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("__x1").cast(dec) * col("__x").cast(dec)).as("__a"),
        sum(col("__x1").cast(dec)).as("__b"),
        sum(col("__x").cast(dec)).as("__c"))
    pairs.join(tot, Seq(keyCol))
      .select(col(keyCol), col("lag"), col("m"), col("__n").as("n"),
        {
          val xbar = col("__s").cast("double") / col("__n").cast("double")
          val num = col("__a").cast("double") - xbar * col("__b").cast("double") -
            xbar * col("__c").cast("double") + col("m").cast("double") * xbar * xbar
          val den = col("__ss").cast("double") - col("__n").cast("double") * xbar * xbar
          round(num / den * lit(1e6)).cast("long").as("acf_micro")
        })
  }

  /** Per-key cross-correlation between two aligned series (one row per
    * (key, t) carrying both x and y) at lags −maxLag..maxLag: lag ℓ
    * correlates x_t with y_{t+ℓ}, so a POSITIVE peak lag means x leads
    * y by ℓ steps. Pairs semantics under gaps (like [[acf]]): each
    * lag's statistic is the exact Pearson correlation over the pairs
    * where both endpoints exist — means and variances of the PAIRED
    * sub-series, so r is always in [−1, 1] and gaps never bias it.
    * Values micro-quantize up front and every power sum runs in
    * DECIMAL(38,0) (Σx² at micro scale passes int64 near 3M buckets —
    * the kappa/KS lesson); the single float is the final ratio,
    * micro-quantized with the identical expression shape both engines
    * execute bit-for-bit. Exact domain: the m·Σx² product bounds
    * |value| near 2·10¹¹ at 40-point series (scaling as 1/√(m³)) —
    * far above any real count series; past it the statistic fails
    * LOUD under ANSI (battery-pinned), never a silent wrap.
    *
    * Plan: a zero-shuffle Expand of the (2·maxLag+1)-literal lag array
    * on the x side, ONE equi-join on (key, t+lag) against the
    * un-exploded y side, one groupBy (key, lag) — at 100 TB the cost
    * is (2L+1)× the series size through one shuffle, never a window
    * over a single partition. Output: (key, lag, m, ccf_micro). */
  def ccf(df: DataFrame, keyCol: String, tCol: String, xCol: String,
      yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64]: $maxLag")
    val dec = "decimal(38,0)"
    val base = df.select(col(keyCol), col(tCol).cast("long").as("__t"),
      (col(xCol).cast("decimal(18,6)") * lit(1000000L)).cast("long").as("__x"),
      (col(yCol).cast("decimal(18,6)") * lit(1000000L)).cast("long").as("__y"))
    val lagged = base
      .withColumn("lag",
        explode(array((-maxLag to maxLag).map(k => lit(k.toLong)): _*)))
      .select(col(keyCol), (col("__t") + col("lag")).as("__t"),
        col("lag"), col("__x").as("__x1"))
    val pairs = lagged
      .join(base.select(col(keyCol), col("__t"), col("__y")), Seq(keyCol, "__t"))
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("__x1").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x1").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x1").cast(dec) * col("__x1").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
    val varX = col("m").cast(dec) * col("__sxx") - col("__sx") * col("__sx")
    val varY = col("m").cast(dec) * col("__syy") - col("__sy") * col("__sy")
    pairs.select(col(keyCol), col("lag"), col("m"),
      when(varX > 0 && varY > 0, // degenerate pairs (m=1 / constant) -> null
        round(
          ((col("m").cast(dec) * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            sqrt(varX.cast("double") * varY.cast("double")))
            * lit(1e6)).cast("long")).as("ccf_micro"))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * method, period even): per key over an integer COUNT series — the
    * grid is zero-filled first (a missing bucket of a count series IS
    * zero, so ROWS windows align with time), then
    *  - trend: the standard centered weighted MA for even period p —
    *    T_t = (x_{t−p/2} + 2·Σ_{|j|<p/2} x_{t+j} + x_{t+p/2}) / 2p,
    *    kept as the integer numerator ×2p (exact), defined only where
    *    the full 2·(p/2)+1-row window exists;
    *  - seasonal index per phase s = t mod p: the mean of detrended
    *    values (x − T), all algebra on the common denominator 2p so
    *    every sum is an exact integer; the single float is the final
    *    mean, micro-quantized.
    * Output: (key, phase, n_obs, seasonal_micro). Plan: one groupBy for
    * buckets, a zero-shuffle sequence-Expand for the grid, ROWS windows
    * inside each key partition (series length = bucket count, far below
    * raw rows), one grouped mean — nothing global, nothing quadratic. */
  def classicalSeasonal(df: DataFrame, keyCol: String, tCol: String,
      valCol: String, period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 0,
      s"period must be even and >= 2 (centered-MA method): $period")
    val half = period / 2
    val span = df.groupBy(col(keyCol))
      .agg(min(col(tCol)).as("__lo"), max(col(tCol)).as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as("__t"))
    val filled = grid.join(
        df.select(col(keyCol), col(tCol).as("__t"),
          col(valCol).cast("long").as("__xr")),
        Seq(keyCol, "__t"), "left")
      .withColumn("__x", coalesce(col("__xr"), lit(0L)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
      .rowsBetween(-half, half)
    val inner = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
      .rowsBetween(-(half - 1), half - 1)
    // numerator of 2p·T: edge terms once, interior terms twice
    val detr = filled
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__tnum",
        sum(col("__x")).over(w) + sum(col("__x")).over(inner))
      .filter(col("__cnt") === (2 * half + 1))
      // d·2p = 2p·x − 2p·T, exact
      .withColumn("__d2p", lit(2L * period) * col("__x") - col("__tnum"))
    detr.groupBy(col(keyCol), pmod(col("__t"), lit(period.toLong)).as("phase"))
      .agg(count(lit(1)).as("n_obs"),
        round((sum(col("__d2p")).cast("double") /
          (lit(2.0 * period) * count(lit(1)).cast("double")))
          * lit(1e6)).cast("long").as("seasonal_micro"))
  }

  /** Theil–Sen robust trend estimator: per key, the MEDIAN of all
    * pairwise slopes (x_j − x_i)/(t_j − t_i), i<j — the 29%-breakdown
    * slope OLS can't give (one wild day does not move it). Pairs are
    * generated by a per-key self equi-join: quadratic IN THE SERIES
    * LENGTH, which is the bucket count — a 3-year daily series is ~600k
    * pairs per key, nothing against raw-event volume; the join shuffles
    * on the key only. Slopes are IEEE doubles of exact integer inputs
    * (deterministic in any engine); the median is positional — values
    * at ⌊(m+1)/2⌋ and ⌊(m+2)/2⌋ averaged, the both-parities form —
    * micro-quantized. Output: (key, n_pairs, slope_micro). */
  def theilSen(df: DataFrame, keyCol: String, tCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(keyCol), col(tCol).cast("long").as("__t"),
      col(valCol).cast("long").as("__x"))
    val pairs = base
      .join(base.select(col(keyCol), col("__t").as("__t2"), col("__x").as("__x2")),
        Seq(keyCol))
      .filter(col("__t") < col("__t2"))
      .select(col(keyCol),
        ((col("__x2") - col("__x")).cast("double") /
          (col("__t2") - col("__t")).cast("double")).as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__s"))
    val ranked = pairs
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    ranked
      .filter(col("__i") === call_function("div", col("__m") + 1L, lit(2L)) ||
        col("__i") === call_function("div", col("__m") + 2L, lit(2L)))
      .groupBy(col(keyCol))
      .agg(max(col("__m")).as("n_pairs"),
        round(((min(col("__s")) + max(col("__s"))) / 2) * lit(1e6))
          .cast("long").as("slope_micro"))
  }

  /** Pettitt change-point test (Pettitt 1979), exact to the last integer:
    * per key over an ordered series (one row per (key, t)), the
    * Mann-Whitney-style statistic
    *   U_t = 2·Σ_{i≤t} r_i − t(n+1)
    * with AVERAGE ranks r (ties get the tie-group mean; 2r = 2·rank +
    * tiecount − 1 keeps everything integral), K = max_{t<n} |U_t|, and
    * the earliest t attaining K as the change location. The approximate
    * significance 2·exp(−6K²/(n³+n²)) is surfaced micro-quantized (the
    * one float, deliberately coarse). Plan: rank/cumsum windows inside
    * each key partition — one shuffle on key; series length per key is
    * the day/bucket count, orders of magnitude below row count, so the
    * window sorts stay small even at 100 TB of raw events. */
  def pettitt(df: DataFrame, keyCol: String, tCol: String,
      valCol: String): DataFrame = {
    val byVal = Window.partitionBy(col(keyCol)).orderBy(col("__x"))
    val ties = Window.partitionBy(col(keyCol), col("__x"))
    val byT = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(col(keyCol))
    val ranked = df
      .select(col(keyCol), col(tCol).cast("long").as("__t"),
        col(valCol).cast("long").as("__x"))
      .withColumn("__r2", lit(2L) * rank().over(byVal) + count(lit(1)).over(ties) - 1L)
      .withColumn("__nn", count(lit(1)).over(n))
      .withColumn("__seq", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("__t"))).cast("long"))
      .withColumn("__u", sum(col("__r2")).over(byT) - col("__seq") * (col("__nn") + 1L))
      .filter(col("__seq") < col("__nn")) // U_n == 0 by construction; exclude
    ranked
      .withColumn("__k", max(abs(col("__u"))).over(n))
      .filter(abs(col("__u")) === col("__k"))
      .groupBy(col(keyCol))
      .agg(max(col("__nn")).as("n"), max(col("__k")).as("k_stat"),
        min(col("__t")).as("cp_t"))
      .select(col(keyCol), col("n"), col("k_stat"), col("cp_t"),
        round(lit(2.0) * exp(lit(-6.0) * col("k_stat").cast("double") * col("k_stat").cast("double") /
          (col("n").cast("double") * col("n").cast("double") * col("n").cast("double") +
            col("n").cast("double") * col("n").cast("double"))) * lit(1e6))
          .cast("long").as("p_micro"))
  }
  /** Per-key exponentially weighted moving average — the monitoring/
    * smoothing classic (Roberts 1959 EWMA control charts), as an EXACT
    * integer recurrence so both engines replay it bit-for-bit:
    *
    *   s_1 = x_1·10⁶ ;  s_t = (α_µ·x_t·10⁶ + (10⁶ − α_µ)·s_{t−1}) div 10⁶
    *
    * — stepwise floor-quantized in micro units, so there is no float
    * and no summation-order dependence anywhere; a recursive-CTE
    * oracle replays the identical recurrence. The recurrence is
    * inherently sequential PER KEY, so each key's series folds inside
    * one group (`mapGroups`, sorted by t) while keys spread across the
    * cluster — the same per-key-sequential shape as the streaming
    * running-state family; series length per key is the only memory
    * bound. `x` must be a non-negative count below 10⁹ (fail-loud).
    *
    * Overflow-free across that WHOLE domain: the naive product
    * α_µ·x·10¹² reaches ~10²¹ and would wrap int64 past x ≈ 9.2·10⁶,
    * so the step is computed via the exact split at the micro
    * boundary — with a = α_µ, b = 10⁶ − α_µ, s = q·10⁶ + r (r < 10⁶):
    *
    *   ⌊(a·x·10⁶ + b·s) / 10⁶⌋  =  a·x + b·q + ⌊b·r / 10⁶⌋
    *
    * (exact because a·x·10⁶ and b·q·10⁶ are divisible by 10⁶ and
    * s ≥ 0). Every term is ≤ 10⁶·10⁹ = 10¹⁵ ≪ 2⁶³, so every
    * intermediate genuinely fits int64 — and the recursive-CTE oracle
    * uses the identical split so neither engine can overflow.
    * Output: (key, t, x, ewma_micro). */
  def ewma(df: DataFrame, keyCol: String, tCol: String, xCol: String,
      alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(tCol).cast("long"),
        col(xCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, Long, Long)]) =>
        val rows = it.toSeq.sortBy(_._2)
        var s = 0L
        var first = true
        rows.iterator.map { case (_, t, x) =>
          require(x >= 0L && x < 1000000000L,
            s"ewma input must be a count in [0, 1e9), got $x for key $k")
          s = if (first) { first = false; x * 1000000L }
          else {
            val b = 1000000L - alphaMicro
            alphaMicro * x + b * (s / 1000000L) + b * (s % 1000000L) / 1000000L
          }
          (k, t, x, s)
        }
      }
      .toDF(keyCol, tCol, xCol, "ewma_micro")
  }

  /** Per-key Holt linear-trend (double exponential) smoothing — EWMA's
    * big sibling for series with drift, where plain EWMA lags the trend
    * forever (Holt 1957):
    *
    *   l_1 = x_1 ;  b_1 = x_2 − x_1 (0 for singletons)
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * as an EXACT stepwise floor-quantized integer recurrence in micro
    * units, so both engines replay it bit-for-bit. Signed state makes
    * the overflow-free split subtler than [[ewma]]'s: every step
    * splits its signed operands at the micro boundary with FLOOR
    * div/mod (s = q·10⁶ + r, 0 ≤ r < 10⁶ even for s < 0), so
    *
    *   ⌊(a·x·10⁶ + b·s) / 10⁶⌋ = a·x + b·q + ⌊b·r / 10⁶⌋
    *   ⌊(g·d + h·s) / 10⁶⌋ = g·q_d + h·q_s + (g·r_d + h·r_s) div 10⁶
    *
    * — each residual term nonnegative and < 10¹², every other term
    * ≤ ~10¹⁵, so nothing approaches int64. The recursive-CTE oracle
    * uses the identical normalized-remainder split. Same per-key-
    * sequential shape as [[ewma]] (keys spread across the cluster,
    * series length is the only per-group bound). `x` must be a
    * non-negative count below 10⁹ (fail-loud). Output:
    * (key, t, x, level_micro, trend_micro). */
  def holt(df: DataFrame, keyCol: String, tCol: String, xCol: String,
      alphaMicro: Long, betaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    require(betaMicro > 0L && betaMicro <= 1000000L,
      s"betaMicro must be in (0, 1e6], got $betaMicro")
    val spark = df.sparkSession
    import spark.implicits._
    val M = 1000000L
    df.select(col(keyCol).cast("string"), col(tCol).cast("long"),
        col(xCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, Long, Long)]) =>
        val rows = it.toSeq.sortBy(_._2)
        rows.foreach { case (_, _, x) =>
          require(x >= 0L && x < 1000000000L,
            s"holt input must be a count in [0, 1e9), got $x for key $k")
        }
        // floor-split of a signed micro value: s = q*M + r, 0 <= r < M
        def qr(s: Long): (Long, Long) =
          (java.lang.Math.floorDiv(s, M), java.lang.Math.floorMod(s, M))
        var l = 0L; var b = 0L
        rows.iterator.zipWithIndex.map { case ((_, t, x), i) =>
          if (i == 0) {
            l = x * M
            b = if (rows.size > 1) (rows(1)._3 - x) * M else 0L
          } else {
            val (a, ac) = (alphaMicro, M - alphaMicro)
            val (g, gc) = (betaMicro, M - betaMicro)
            val prevL = l
            val (qs, rs) = qr(l + b)           // l_{t-1} + b_{t-1}
            l = a * x + ac * qs + ac * rs / M
            val (qd, rd) = qr(l - prevL)       // level delta
            val (qb, rb) = qr(b)
            b = g * qd + gc * qb + (g * rd + gc * rb) / M
          }
          (k, t, x, l, b)
        }
      }
      .toDF(keyCol, tCol, xCol, "level_micro", "trend_micro")
  }

  /** OHLC candlestick bars: per (key, tumbling bucket of `widthSec`),
    * the first/highest/lowest/last observation plus exact volume. The
    * classic market-data rollup (open-high-low-close), equally useful
    * as a generic "first/extremes/last per window" compaction for any
    * measurement stream.
    *
    * Open/close need a total order inside the bucket; wall-clock `ts`
    * alone can tie, so the order key is the pair (t_us, id) with
    * `idCol` a unique row id — open = value at the MIN (t_us, id),
    * close = value at the MAX, picked by min/max over an order-keyed
    * struct in the same single-shuffle aggregation as the min/max/
    * count — no window sort, no second pass. High/low compare the raw
    * value (no arithmetic, engine-exact); the volume sum is micro-
    * quantized to a long so summation order can't perturb a float.
    * Routes through [[ohlcState]]/[[ohlcFromState]], so incremental
    * bar maintenance off persisted per-day states is the same code
    * path.
    *
    * Plan shape at 100 TB: one hash aggregation with map-side combine
    * on (key, bucket) — state per group is five scalars + two order
    * keys, so partial aggregation compacts each input partition to its
    * distinct (key, bucket) set before the shuffle.
    *
    * Output: (key, window_start, open, high, low, close, n_obs,
    * sum_micro). */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, widthSec: Long = 3600L): DataFrame =
    ohlcFromState(ohlcState(df, keyCol, tsCol, idCol, valCol, widthSec))

  /** Mergeable OHLC bar state: one row per (key, bucket) carrying the
    * open/close picks WITH their (t_us, id) order keys — `open_k` is
    * the MINIMUM of struct(t_us, id, v) (struct ordering compares
    * fields left to right, and id is unique, so v along for the ride
    * can never decide), `close_k` the maximum. Min/max over a total
    * order are associative and commutative, and the other four
    * aggregates are count/sum/min/max monoids — so per-day persisted
    * states fold with [[mergeOhlcStates]] into EXACTLY the bars a
    * one-shot pass over the union computes. Persist one frame per
    * day/partition and bar maintenance never re-reads history. */
  def ohlcState(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, widthSec: Long = 3600L): DataFrame = {
    require(widthSec > 0, s"widthSec must be positive, got $widthSec")
    val sec = unix_timestamp(col(tsCol))
    val v = col(valCol).cast("double")
    val tagged = struct(unix_micros(col(tsCol).cast("timestamp")).as("t_us"),
      col(idCol).cast("long").as("id"), v.as("v"))
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        (floor(sec / widthSec) * widthSec).as("window_start"))
      .agg(
        min(tagged).as("open_k"),
        max(tagged).as("close_k"),
        max(v).as("high"),
        min(v).as("low"),
        count(lit(1)).as("n_obs"),
        sum(round(v * lit(1000000L)).cast("long")).as("sum_micro"))
  }

  /** Fold any number of [[ohlcState]] frames (unioned) into one state
    * row per (key, bucket) — the monoid merge. */
  def mergeOhlcStates(states: DataFrame): DataFrame =
    states.groupBy("key", "window_start")
      .agg(
        min("open_k").as("open_k"),
        max("close_k").as("close_k"),
        max("high").as("high"),
        min("low").as("low"),
        sum("n_obs").as("n_obs"),
        sum("sum_micro").as("sum_micro"))

  /** Project OHLC state to the bar schema (key, window_start, open,
    * high, low, close, n_obs, sum_micro) — [[ohlcBars]] routes through
    * here, so direct and from-state bars are one code path. */
  def ohlcFromState(state: DataFrame): DataFrame =
    state.select(col("key"), col("window_start"),
      col("open_k.v").as("open"), col("high"), col("low"),
      col("close_k.v").as("close"), col("n_obs"), col("sum_micro"))

  /** Time-weighted average (TWAP): per key, the mean of a step signal
    * that HOLDS each observed value until the next observation — the
    * honest average of an irregularly-sampled series, where the plain
    * AVG over-weights bursts of dense samples. Each observation's
    * weight is its holding time (microseconds to the key's next
    * observation in (ts, id) order); the key's last observation has
    * nothing after it and carries zero weight, per the standard
    * half-open [t_i, t_{i+1}) convention.
    *
    * Exactness: values are micro-quantized to longs once; the
    * numerator Σ value_micro·hold_us runs in decimal(38,0) (a long
    * would overflow at value_micro·span_us ≈ 10^9·10^11), and the
    * final division is the exact floor divmod split, so `twap_micro`
    * is bit-identical in any engine. Ties on ts order by the unique
    * id; equal timestamps yield zero holds, so the value order inside
    * a tie can't affect the sum.
    *
    * Plan shape: one window (lead over the key partition) + one
    * grouped aggregation — both shuffle on the key, and AQE coalesces
    * them into a single exchange since the partitioning matches.
    * Per-key state is O(1). Keys with a single observation have zero
    * duration and surface with NULL twap_micro (undefined, loudly).
    *
    * Output: (key, n_obs, dur_us, twap_micro). */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String): DataFrame =
    twapFromState(twapState(df, keyCol, tsCol, idCol, valCol))

  /** Mergeable TWAP state: one row per key carrying the running
    * (n_obs, dur_us, num) accumulators PLUS the key's first and last
    * observations as (t_us, id, v_micro) structs — exactly what a
    * later slice needs to bridge onto this one. Unlike a count
    * monoid, TWAP state merges under a TIME ORDER (the earlier
    * slice's last value holds until the later slice's first
    * observation), so the fold face is the ordered pairwise
    * [[mergeTwapStates]], matching how a streaming gate folds
    * arriving batches. */
  def twapState(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val dec = "decimal(38,0)"
    val stepped = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), us.as("t_us"),
        round(col(valCol).cast("double") * lit(1000000L)).cast("long")
          .as("v_micro"), col(idCol).cast("long").as("id"))
      .withColumn("hold_us",
        coalesce(lead(col("t_us"), 1).over(
          Window.partitionBy(col("key")).orderBy(col("t_us"), col("id"))),
          col("t_us")) - col("t_us"))
    val tagged = struct(col("t_us"), col("id"), col("v_micro"))
    stepped.groupBy("key").agg(
      count(lit(1)).as("n_obs"),
      sum("hold_us").as("dur_us"),
      sum(col("v_micro").cast(dec) * col("hold_us")).as("num"),
      min(tagged).as("first_k"),
      max(tagged).as("last_k"))
  }

  /** Ordered merge of two TWAP states: every observation of a key in
    * `earlier` must precede the key's observations in `later` (the
    * arriving-batch contract — identical to the other gates'
    * time-ordered replay assumption). The earlier slice's last value
    * is held across the seam to the later slice's first observation;
    * accumulators then add. Associative under that order, so folding
    * day 1..N pairwise equals the one-shot pass — bit-identically,
    * since every term is integer/decimal. */
  def mergeTwapStates(earlier: DataFrame, later: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val e = earlier.select(col("key"), col("n_obs").as("e_n"),
      col("dur_us").as("e_dur"), col("num").as("e_num"),
      col("first_k").as("e_first"), col("last_k").as("e_last"))
    val l = later.select(col("key"), col("n_obs").as("l_n"),
      col("dur_us").as("l_dur"), col("num").as("l_num"),
      col("first_k").as("l_first"), col("last_k").as("l_last"))
    val both = col("e_n").isNotNull && col("l_n").isNotNull
    val bridge = when(both, col("l_first.t_us") - col("e_last.t_us"))
      .otherwise(lit(0L))
    e.join(l, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("e_n"), lit(0L)) + coalesce(col("l_n"), lit(0L)))
          .as("n_obs"),
        (coalesce(col("e_dur"), lit(0L)) + bridge +
          coalesce(col("l_dur"), lit(0L))).as("dur_us"),
        (coalesce(col("e_num"), lit(0L).cast(dec)) +
          when(both, col("e_last.v_micro").cast(dec) * bridge)
            .otherwise(lit(0L).cast(dec)) +
          coalesce(col("l_num"), lit(0L).cast(dec))).cast(dec).as("num"),
        coalesce(col("e_first"), col("l_first")).as("first_k"),
        coalesce(col("l_last"), col("e_last")).as("last_k"))
  }

  /** Final TWAP read off a state frame — the exact sign-safe
    * floor-divmod half-up division; [[twap]] routes through here, so
    * direct, incremental, and streaming-gate TWAPs are one code
    * path. Output: (key, n_obs, dur_us, twap_micro). */
  def twapFromState(state: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // exact round-half-up division valid for ANY numerator sign:
    // pmod is the nonnegative remainder, so (num - r) / den is the
    // floor quotient exactly (no truncation-direction ambiguity), and
    // the half-up carry compares 2r against den in exact decimals
    val den = col("dur_us").cast(dec)
    val r = pmod(col("num"), den)
    val floorQ = call_function("div", col("num") - r, den)
    state.select(col("key"), col("n_obs"), col("dur_us"),
      when(col("dur_us") > 0L,
        (floorQ + when(r * 2 >= den, lit(1)).otherwise(lit(0))).cast("long"))
        .as("twap_micro"))
  }

  /** Per-(key, day) count monoid — the daily twin of [[hourCells]],
    * exposed because daily counts are the state a CUSUM streaming gate
    * persists: microbatch-level cell states re-sum into the full series
    * without rescanning events. */
  def dayCells(df: DataFrame, secCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol),
        call_function("div", col(secCol), lit(86400L)).as("day"))
      .agg(count(lit(1)).as("n"))

  /** Page's CUSUM change-point detector over a keyed series (one row
    * per (key, t)), EXACT in integer arithmetic end to end — the
    * flagged set is a pure function of the data, never of float
    * summation order.
    *
    * Target/allowance are self-calibrated off the key's own series:
    * with μ = total/n the in-control mean and allowance k = (kNum/kDen)·μ,
    * the classic recursions
    *
    *   S⁺_t = max(0, S⁺_{t−1} + x_t − μ − k)   (upward shifts)
    *   S⁻_t = max(0, S⁻_{t−1} − x_t + μ − k)   (downward shifts)
    *
    * are evaluated via the prefix identity max-recursion ≡ running
    * cumsum minus its running min (the empty prefix included), so no
    * per-row iteration exists anywhere: scaling every deviation by
    * n·kDen clears both divisions —
    *
    *   D⁺_i = kDen·n·x_i − (kDen+kNum)·total      (exact integers)
    *   S⁺_t = cum⁺_t − min(0, min_{i≤t} cum⁺_i)
    *
    * and a point alarms when S exceeds h = (hNum/hDen)·|μ|, i.e.
    * S·hDen > hNum·kDen·|total| cross-multiplied (no division). All
    * sums run in DECIMAL(38,0) — a year of 10^12-count days keeps the
    * running sums near 10^30, far past int64 (the kappa/KS overflow
    * lesson). Surfaced magnitudes are micro-quantized in μ units via
    * the exact half-up divmod split (S ≥ 0, so the positive-branch
    * split suffices).
    *
    * Plan: ONE shuffle on key; the per-key totals and both running
    * extrema are windows over that same partitioning (no join, no
    * second exchange); series length per key is the bucket count
    * (days), never raw rows. Output: (key, t, x_micro, s_pos_micro,
    * s_neg_micro, flag_up, flag_down). */
  def cusum(df: DataFrame, keyCol: String, tCol: String, valCol: String,
      kNum: Long = 1L, kDen: Long = 4L,
      hNum: Long = 2L, hDen: Long = 1L): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"allowance must be >= 0: $kNum/$kDen")
    require(hNum > 0 && hDen > 0, s"threshold must be > 0: $hNum/$hDen")
    val dec = "decimal(38,0)"
    val base = df.select(col(keyCol), col(tCol).cast("long").as("t"),
      (col(valCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
        .as("x_micro"))
    val whole = Window.partitionBy(col(keyCol))
    val run = Window.partitionBy(col(keyCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = count(lit(1)).over(whole).cast(dec)
    val total = sum(col("x_micro").cast(dec)).over(whole)
    val dUp = lit(kDen).cast(dec) * n * col("x_micro").cast(dec) -
      lit(kDen + kNum).cast(dec) * total
    val dDn = lit(kDen).cast(dec) * n * col("x_micro").cast(dec) -
      lit(kDen - kNum).cast(dec) * total
    val stepped = base
      .withColumn("__tot", total)
      .withColumn("__cu", sum(dUp).over(run))
      .withColumn("__cd", sum(dDn).over(run))
      .withColumn("__sp", col("__cu") - least(lit(0).cast(dec), min(col("__cu")).over(run)))
      .withColumn("__sn", greatest(lit(0).cast(dec), max(col("__cd")).over(run)) - col("__cd"))
    // micro magnitude in μ units: S / (kDen·|total|), exact half-up
    def mu(s: Column): Column = {
      val den = lit(kDen).cast(dec) * abs(col("__tot"))
      when(col("__tot") =!= 0,
        call_function("div", s * lit(2000000L).cast(dec) + den,
          den * 2).cast("long"))
    }
    def alarm(s: Column): Column =
      col("__tot") =!= 0 &&
        s * lit(hDen).cast(dec) > lit(hNum * kDen).cast(dec) * abs(col("__tot"))
    stepped.select(col(keyCol), col("t"), col("x_micro"),
      mu(col("__sp")).as("s_pos_micro"), mu(col("__sn")).as("s_neg_micro"),
      alarm(col("__sp")).as("flag_up"), alarm(col("__sn")).as("flag_down"))
  }

  /** [[cusum]] over a persisted daily-count cell state (columns:
    * keyCol, day, n) — used by the streaming CUSUM gate, whose stored
    * state IS this frame: cells re-sum first, so unioned per-batch
    * states pool exactly and the gate equals a batch recompute. */
  def cusumFromCells(cells: DataFrame, keyCol: String,
      kNum: Long = 1L, kDen: Long = 4L,
      hNum: Long = 2L, hDen: Long = 1L): DataFrame =
    cusum(cells.groupBy(col(keyCol), col("day")).agg(sum("n").as("n")),
      keyCol, "day", "n", kNum, kDen, hNum, hDen)

  /** [[holt]] over the SAME persisted daily-count cell state the CUSUM
    * gate maintains — one stored state serves both change detection and
    * trend smoothing (the PSI/JS shared-histogram discipline): the gate
    * ingests once, and every series face reads summaries only. */
  def holtFromCells(cells: DataFrame, keyCol: String,
      alphaMicro: Long, betaMicro: Long): DataFrame =
    holt(cells.groupBy(col(keyCol), col("day")).agg(sum("n").as("x")),
      keyCol, "day", "x", alphaMicro, betaMicro)

  /** Forecast-baseline errors per key — the MASE denominators (Hyndman
    * & Koehler 2006): the mean absolute error of the NAIVE forecast
    * (ŷ_t = y_{t−1}) and the SEASONAL-NAIVE forecast (ŷ_t =
    * y_{t−season}) over the observed sequence. Any model the smoothing
    * family produces (ewma/holt) is judged against these — a
    * "forecast" that can't beat last-week's value isn't one.
    *
    * Lags are POSITIONAL over each key's observed order (resample
    * first — [[resampleInterpolate]]/[[gapFillInterpolate]] — if the
    * grid has holes and strict time lags matter). Exactness: values
    * micro-quantize, |errors| are exact int64, MAE is one exact
    * decimal division. Keys too short for a lag report 0 comparisons
    * and a NULL MAE.
    *
    * Plan: one window pass per key partitioning (parallel across
    * keys), one grouped aggregate. Output: (keyCol, n, n_naive,
    * mae_naive_micro, n_snaive, mae_snaive_micro). */
  def forecastBaselineErrors(df: DataFrame, keyCol: String, tCol: String,
      valCol: String, season: Int): DataFrame = {
    require(season >= 2,
      s"season must be >= 2 (season 1 IS the naive lag): $season")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val xm = floor(col(valCol).cast("double") * 1000000L + 0.5).cast("long")
    val d = df.filter(col(valCol).isNotNull)
      .select(col(keyCol), col(tCol), xm.as("xm"))
      .withColumn("d1", abs(col("xm") - lag(col("xm"), 1).over(w)))
      .withColumn("ds", abs(col("xm") - lag(col("xm"), season).over(w)))
    d.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      count(col("d1")).as("n_naive"),
      when(count(col("d1")) > 0L, call_function("div",
        sum(col("d1").cast(dec)), count(col("d1")).cast(dec)).cast("long"))
        .as("mae_naive_micro"),
      count(col("ds")).as("n_snaive"),
      when(count(col("ds")) > 0L, call_function("div",
        sum(col("ds").cast(dec)), count(col("ds")).cast(dec)).cast("long"))
        .as("mae_snaive_micro"))
  }

  /** Rolling-origin backtest folds (the forecasting cross-validation:
    * "evaluation on a rolling forecasting origin", Hyndman) — fold f's
    * TEST window is the `horizon`-length slice ending at
    * t_max − (folds − f)·horizon, its TRAIN set everything at or
    * before the window's start; rows after the fold's end are EXCLUDED
    * from that fold (future leakage is structurally impossible, the
    * contamination-safe-split discipline). Every key uses its OWN
    * t_max, so short-lived keys backtest over their own span.
    *
    * Plan: one per-key max (map-side combined) joined back on the key,
    * one broadcast folds-spine expansion (rows × folds — the caller
    * picks small fold counts), pure column arithmetic. Output:
    * (keyCol, tCol, fold, role ∈ train|test). */
  def rollingOriginFolds(df: DataFrame, keyCol: String, tCol: String,
      folds: Int, horizon: Long): DataFrame = {
    require(folds >= 1, s"folds must be >= 1: $folds")
    require(horizon >= 1L, s"horizon must be >= 1: $horizon")
    val spark = df.sparkSession
    import spark.implicits._
    val spine = broadcast((1 to folds).map(_.toLong).toDF("fold"))
    val tmax = df.groupBy(col(keyCol)).agg(max(col(tCol)).as("__tmax"))
    df.select(col(keyCol), col(tCol))
      .join(tmax, Seq(keyCol))
      .crossJoin(spine)
      .withColumn("__end",
        col("__tmax") - (lit(folds.toLong) - col("fold")) * lit(horizon))
      .withColumn("role",
        when(col(tCol) > col("__end") - lit(horizon) &&
          col(tCol) <= col("__end"), "test")
          .when(col(tCol) <= col("__end") - lit(horizon), "train"))
      .filter(col("role").isNotNull)
      .select(col(keyCol), col(tCol), col("fold"), col("role"))
  }
}
