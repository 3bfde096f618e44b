package graft.ops

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches => ThetaSketches, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the partition→sketch→merge decomposition
  * that makes distinct-set and quantile analytics tractable at 100 TB.
  *
  * Both operators here follow the same scale shape as
  * [[HeavyHitters]]: one pass over the data builds a per-partition
  * sketch inside `mapPartitions` (the one place imperative per-partition
  * state is the right tool — a Catalyst aggregate would re-serialize the
  * sketch buffer per row), the shuffle carries only
  * `numPartitions × |groups|` sketch blobs (KBs each), and a tiny keyed
  * merge produces one sketch per group. History-friendly: the merged
  * per-group sketch IS the stored state, so tomorrow's delta needs one
  * pass over the delta only — exactly the [[IncrementalAgg]] contract,
  * extended from counts/sums to distinct sets and quantiles.
  *
  * Exactness: both sketch families are EXACT below their retention
  * capacity (theta: no sampling while the hash table has not exceeded
  * its nominal-entries budget; KLL: all items retained until the first
  * compaction). The driver queries pick capacities that hold at oracle
  * scale, so their rows are hash-checked against DuckDB like any exact
  * operator; estimation-mode behavior is tolerance-pinned in
  * SketchesSpec against the libraries' published error bounds.
  */
object Sketches {

  // ---------------------------------------------------------------- theta

  /** Per-partition theta sketches of `idCol` for every `segCol` value:
    * emits one (segment, compact-sketch) row per segment per partition. */
  private def thetaPartition(
      it: Iterator[(String, Long)], lgK: Int): Iterator[(String, Array[Byte])] = {
    val sketches = new java.util.HashMap[String, UpdateSketch]()
    while (it.hasNext) {
      val (seg, id) = it.next()
      var sk = sketches.get(seg)
      if (sk == null) {
        sk = UpdateSketch.builder().setLogNominalEntries(lgK).build()
        sketches.put(seg, sk)
      }
      sk.update(id)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    sketches.forEach((seg, sk) => out += ((seg, sk.compact(true, null).toByteArray)))
    out.iterator
  }

  /** Theta-union aggregator over compact-sketch blobs. Input rows per
    * group = numPartitions (sketch-sized, never data-sized); each union
    * step is O(2^lgK). Commutative and associative — set union is the
    * monoid — so Catalyst may partial-aggregate freely. */
  private class ThetaUnion(lgK: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def union2(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        u.union(ThetaSketches.wrapCompactSketch(Memory.wrap(x)))
        u.union(ThetaSketches.wrapCompactSketch(Memory.wrap(y)))
        u.getResult(true, null).toByteArray
      }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = union2(b, a)
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = union2(x, y)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One compact theta sketch of `idCol`'s distinct values per `segCol`
    * group. Output: (segment, sketch BINARY) — aggregate-sized state,
    * suitable for storage and later delta merges. NULL segments and NULL
    * ids are excluded (a sketch of "unknown member" is meaningless).
    *
    * Integral ids feed the sketch directly; any other id type (string
    * UUIDs, decimals) is keyed by `xxhash64` — theta only needs a
    * stable 64-bit key per member, and a lossy `cast("long")` would
    * turn non-numeric ids into NULLs that crash the typed encoder. */
  def segmentSketches(
      df: DataFrame, segCol: String, idCol: String, lgK: Int = 14): DataFrame = {
    require(lgK >= 4 && lgK <= 26, s"lgK must be in [4,26], got $lgK")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    val idKey = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(idCol).cast("long")
      case _                                             => xxhash64(col(idCol))
    }
    val pairs = df
      .filter(col(segCol).isNotNull && col(idCol).isNotNull)
      .select(col(segCol).cast("string"), idKey)
      .as[(String, Long)]
    val union = udaf(new ThetaUnion(lgK))
    pairs
      .mapPartitions(thetaPartition(_, lgK))
      .toDF("segment", "sketch")
      .groupBy("segment")
      .agg(union(col("sketch")).as("sketch"))
  }

  /** Merge theta sketch states (each in [[segmentSketches]] shape,
    * keyed by `segment`): the incremental step is
    * `mergeSegmentSketches(lgK, state, segmentSketches(delta, ...))` —
    * set union is the monoid, so state + delta == a from-scratch build
    * over all rows (exactly, including in estimation mode: the union
    * operator is order-insensitive on compact sketches). */
  def mergeSegmentSketches(lgK: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeSegmentSketches needs at least one state")
    val union = udaf(new ThetaUnion(lgK))
    states.reduce(_ unionByName _)
      .groupBy("segment")
      .agg(union(col("sketch")).as("sketch"))
  }

  /** Distinct-count estimates off a [[segmentSketches]]-shaped state. */
  def estimateSegments(state: DataFrame): DataFrame =
    state.select(col("segment"), estimateUdf(col("sketch")).as("n_distinct_est"))

  /** Rounded distinct-count estimate off a compact theta sketch blob. */
  private def estimateUdf =
    udf { (bytes: Array[Byte]) =>
      math.round(ThetaSketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate)
    }

  /** Pairwise audience overlap between segments: for every unordered
    * segment pair (a < b), the distinct-id count of each side and of the
    * intersection, off the merged sketches — the data itself is read
    * exactly once, by [[segmentSketches]].
    *
    * Scale: the pair join runs over |segments| sketch rows, so its cost
    * is |segments|² × O(2^lgK) — independent of the 100 TB underneath.
    * For segment counts where the full pair matrix itself is the
    * bottleneck, filter the sketch table before crossing; the sketches
    * compose under any such restriction.
    *
    * Estimates are rounded to whole members; while every input sketch is
    * in exact mode (distinct count per segment ≤ 2^lgK) intersections
    * and counts are exactly the true values, which is what the driver
    * oracle checks at its scale. */
  def segmentOverlap(
      df: DataFrame, segCol: String, idCol: String, lgK: Int = 14): DataFrame = {
    val sk = segmentSketches(df, segCol, idCol, lgK)
    val estimate = estimateUdf
    val overlap = udf { (x: Array[Byte], y: Array[Byte]) =>
      val ix = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
      ix.intersect(ThetaSketches.wrapCompactSketch(Memory.wrap(x)))
      ix.intersect(ThetaSketches.wrapCompactSketch(Memory.wrap(y)))
      math.round(ix.getResult(true, null).getEstimate)
    }
    val a = sk.select(col("segment").as("seg_a"), col("sketch").as("sk_a"))
    val b = sk.select(col("segment").as("seg_b"), col("sketch").as("sk_b"))
    a.join(b, col("seg_a") < col("seg_b"))
      .select(
        col("seg_a"), col("seg_b"),
        estimate(col("sk_a")).as("n_a"),
        estimate(col("sk_b")).as("n_b"),
        overlap(col("sk_a"), col("sk_b")).as("n_overlap"))
  }

  /** Sliding-window distinct stickiness (DAU / trailing-`windowDays`
    * MAU) off mergeable daily theta sketches — the scale-out
    * alternative to [[graft.ext.Events.dauMau]]'s exact bounded
    * expansion. The data is read ONCE into per-day sketches; the
    * window union then runs over |days| sketch rows (each day's sketch
    * fans out to its `windowDays` windows, mirroring the exact
    * operator's expansion — but carrying KB blobs, not the activity
    * set). At 100 TB the daily sketches are yesterday's stored state:
    * a new day appends one sketch and re-unions 30 blobs per window,
    * touching no history rows.
    *
    * Same output contract as the exact operator (day, dau, mau,
    * stickiness_micro — integer micro-ratio); while daily AND windowed
    * distinct counts stay within 2^lgK the sketches are in exact mode
    * and the rows equal the exact operator's, which is what the driver
    * oracle (shared with `events_dau_mau`) checks. */
  def dauMau(events: DataFrame, windowDays: Int = 30, lgK: Int = 14): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val day = call_function("div", graft.ext.Events.tsSec(events), lit(86400L))
    val daySk = segmentSketches(
        events.select(day.as("day"), col("user_id")), "day", "user_id", lgK)
      .select(col("segment").cast("long").as("day"), col("sketch"))
    val estimate = estimateUdf
    val union = udaf(new ThetaUnion(lgK))
    val dau = daySk.select(col("day"), estimate(col("sketch")).as("dau"))
    val mau = daySk
      .select(explode(sequence(col("day"), col("day") + lit(windowDays.toLong - 1)))
        .as("day"), col("sketch"))
      .groupBy("day")
      .agg(union(col("sketch")).as("sk"))
      .select(col("day"), estimate(col("sk")).as("mau"))
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        call_function("div", col("dau") * lit(1000000L), col("mau"))
          .as("stickiness_micro"))
  }

  // ---------------------------------------------------------- freq items

  private def freqSerDe = new org.apache.datasketches.common.ArrayOfStringsSerDe()

  /** Per-partition frequent-items sketches of `itemCol` per group. */
  private def freqPartition(
      it: Iterator[(String, String)], maxMapSize: Int): Iterator[(String, Array[Byte])] = {
    val sketches =
      new java.util.HashMap[String, org.apache.datasketches.frequencies.ItemsSketch[String]]()
    while (it.hasNext) {
      val (g, v) = it.next()
      var sk = sketches.get(g)
      if (sk == null) {
        sk = new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)
        sketches.put(g, sk)
      }
      sk.update(v)
    }
    val serDe = freqSerDe
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    sketches.forEach((g, sk) => out += ((g, sk.toByteArray(serDe))))
    out.iterator
  }

  /** Frequent-items merge aggregator over serialized sketches. */
  private class FreqMerge(maxMapSize: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def merge2(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val serDe = freqSerDe
        val sk = org.apache.datasketches.frequencies.ItemsSketch
          .getInstance(Memory.wrap(x), serDe)
        sk.merge(org.apache.datasketches.frequencies.ItemsSketch
          .getInstance(Memory.wrap(y), serDe))
        sk.toByteArray(serDe)
      }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = merge2(b, a)
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = merge2(x, y)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One merged Misra-Gries-family frequent-items sketch of `itemCol`
    * per `groupCol` group: (grp, sketch BINARY) — the mergeable
    * incremental-state complement to [[HeavyHitters]]'s exact two-pass
    * top-k: per-group item frequencies maintained under daily deltas
    * with bounded state (maxMapSize counters) and no history re-scan.
    * NULL groups and NULL items are excluded. */
  def freqSketches(
      df: DataFrame, groupCol: String, itemCol: String, maxMapSize: Int): DataFrame = {
    require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
      s"maxMapSize must be a power of 2 >= 8 (the sketch library's floor), got $maxMapSize")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .select(col(groupCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
    val merge = udaf(new FreqMerge(maxMapSize))
    pairs
      .mapPartitions(freqPartition(_, maxMapSize))
      .toDF("grp", "sketch")
      .groupBy("grp")
      .agg(merge(col("sketch")).as("sketch"))
  }

  /** Read the frequent items off merged sketches (NO_FALSE_NEGATIVES:
    * every item whose true count exceeds the sketch's error envelope is
    * guaranteed present). One row per (grp, item) with the estimate and
    * its deterministic bounds: lb <= true count <= ub always; in exact
    * mode (distinct items per group within the map budget, no purge)
    * lb == est == ub == the true count — the state the driver oracle
    * replays as a plain contingency count. */
  def frequentItems(state: DataFrame): DataFrame = {
    val rows = udf { (bytes: Array[Byte]) =>
      val sk = org.apache.datasketches.frequencies.ItemsSketch
        .getInstance(Memory.wrap(bytes), freqSerDe)
      sk.getFrequentItems(org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
        .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound)).toSeq
    }
    state
      .select(col("grp"), explode(rows(col("sketch"))).as("r"))
      .select(col("grp"), col("r._1").as("item"), col("r._2").as("est"),
        col("r._3").as("lb"), col("r._4").as("ub"))
  }

  // ------------------------------------------------------------------ kll

  /** Per-partition KLL sketches of `valueCol` per group. */
  private def kllPartition(
      it: Iterator[(String, Double)], k: Int): Iterator[(String, Array[Byte])] = {
    val sketches = new java.util.HashMap[String, KllDoublesSketch]()
    while (it.hasNext) {
      val (g, v) = it.next()
      var sk = sketches.get(g)
      if (sk == null) {
        sk = KllDoublesSketch.newHeapInstance(k)
        sketches.put(g, sk)
      }
      sk.update(v)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    sketches.forEach((g, sk) => out += ((g, sk.toByteArray)))
    out.iterator
  }

  /** KLL merge aggregator over serialized sketches. */
  private class KllMerge(k: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def merge2(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(x))
        sk.merge(KllDoublesSketch.heapify(Memory.wrap(y)))
        sk.toByteArray
      }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = merge2(b, a)
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = merge2(x, y)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge KLL sketch states (each in [[groupSketches]] shape, keyed by
    * `grp`): state + delta == a from-scratch build's accuracy class —
    * KLL's error bound is preserved under merge regardless of how the
    * data was split (and below capacity the merge is lossless, which is
    * what the delta battery asserts exactly). */
  def mergeGroupSketches(k: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeGroupSketches needs at least one state")
    val merge = udaf(new KllMerge(k))
    states.reduce(_ unionByName _)
      .groupBy("grp")
      .agg(merge(col("sketch")).as("sketch"))
  }

  /** Merge frequent-items states (each in [[freqSketches]] shape):
    * Misra-Gries merge adds error envelopes but keeps the deterministic
    * lb/ub guarantees; below the map budget it is lossless. */
  def mergeFreqSketches(maxMapSize: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeFreqSketches needs at least one state")
    val merge = udaf(new FreqMerge(maxMapSize))
    states.reduce(_ unionByName _)
      .groupBy("grp")
      .agg(merge(col("sketch")).as("sketch"))
  }

  /** One merged KLL sketch of `valueCol` per `groupCol` group:
    * (group, sketch BINARY). NULL groups and NULL/NaN values are
    * excluded (NaN has no rank). */
  def groupSketches(
      df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 8, s"KLL k must be >= 8, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(col(groupCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
    val merge = udaf(new KllMerge(k))
    pairs
      .mapPartitions(kllPartition(_, k))
      .toDF("grp", "sketch")
      .groupBy("grp")
      .agg(merge(col("sketch")).as("sketch"))
  }

  /** Per-group quantiles at the given normalized ranks, read off merged
    * KLL sketches (INCLUSIVE search: the smallest retained item whose
    * cumulative weight reaches ⌈rank·n⌉ — in exact mode, precisely the
    * ⌈rank·n⌉-th order statistic, the definition the driver oracle
    * replays in SQL). One output row per (group, rank).
    *
    * `k` trades accuracy for sketch size: groups whose row count stays
    * ≤ the level-0 capacity are exact; beyond that the normalized rank
    * error is the published KLL bound (~0.82% two-sided at k=800,
    * shrinking as k grows) regardless of data size or merge order —
    * that bound, not the data volume, is what a 100 TB run inherits. */
  def groupQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      probs: Seq[Double], k: Int = 800): DataFrame = {
    require(probs.nonEmpty, "need at least one rank")
    require(probs.forall(p => p > 0.0 && p <= 1.0),
      s"ranks must be in (0,1], got $probs")
    readQuantiles(groupSketches(df, groupCol, valueCol, k), probs, groupCol)
  }

  /** Quantile read off a [[groupSketches]]-shaped state (built directly
    * or via [[mergeGroupSketches]] delta maintenance). */
  def readQuantiles(
      state: DataFrame, probs: Seq[Double], outGroupCol: String = "grp"): DataFrame = {
    val quantile = udf { (bytes: Array[Byte], p: Double) =>
      KllDoublesSketch.heapify(Memory.wrap(bytes))
        .getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
    }
    state
      .select(col("grp").as(outGroupCol), explode(typedLit(probs)).as("p"),
        col("sketch"))
      .select(col(outGroupCol), col("p"), quantile(col("sketch"), col("p")).as("q"))
  }
}
