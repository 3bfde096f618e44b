package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter aggregations.
  *
  * A plain `groupBy(key)` sends every record of a hot key to one reducer;
  * at 100 TB a single viral key can stall a stage. Two-stage salted
  * aggregation first aggregates on (key, salt) — spreading a hot key over
  * `salts` reducers — then merges the partials per key. Correct for any
  * algebraic aggregate expressed as (partial, merge) pairs.
  *
  * (For JOIN skew, AQE's skew-join splitting handles it at runtime —
  * enabled by default in the session config; nothing to hand-roll.)
  */
object Skew {

  /** Salted count + sum aggregation: equivalent to
    * `df.groupBy(keys).agg(count(1), sum(valueCol))` with hot keys spread
    * over `salts` partial groups.
    *
    * The salt is derived from a hash of the whole row's partition-local
    * position via `spark_partition_id` + a cheap row hash — deterministic
    * for a given partitioning, uniform enough to spread hot keys. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salt = pmod(xxhash64(col(valueCol), spark_partition_id(), monotonically_increasing_id()),
      lit(salts))
    df
      .withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
  }

  /** Generic two-stage aggregation: caller supplies partial-stage and
    * merge-stage aggregate columns (must be algebraic: merge(partials) ==
    * aggregate(all)). */
  def salted(df: DataFrame, keys: Seq[String], saltSource: Column, salts: Int)(
      partials: Seq[Column])(merges: Seq[Column]): DataFrame =
    df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)

  /** Salted equi join for skewed keys, the manual fallback when AQE's
    * skew splitting can't help (e.g. the small side is too big to
    * broadcast but the big side's key distribution is pathological):
    * every big-side row gets a salt in [0, salts) hashed from its
    * partition-local position (`spark_partition_id` +
    * `monotonically_increasing_id`, same recipe as [[saltedCountSum]] —
    * deterministic for a given input partitioning), the small side is
    * replicated once per salt (explode over a salts-length array —
    * small side only), and the join key becomes (key, salt) — a hot
    * key's rows now land on `salts` reducers instead of one. Position,
    * not content: a hot key whose rows are IDENTICAL duplicates (the
    * degenerate case skew mitigation exists for) still spreads, where a
    * content hash would put every duplicate on one reducer.
    *
    * Exact: each big-side row meets exactly the one replica of its
    * matching small-side row that carries its salt. Cost: small side
    * ×salts (bounded — that side is dimension-like by assumption), big
    * side unchanged. Inner and left joins (the semantics where
    * replication cannot duplicate output). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val b = big.withColumn("__salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(salts.toLong)).cast("int"))
    val s = small
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted equi join that salts ONLY detected hot keys — the production
    * refinement of [[saltedJoin]]: blanket salting replicates the whole
    * small side `salts`× and widens every exchange; at 100 TB the right
    * move is to pay that cost for the handful of pathological keys and
    * leave the rest on the stock shuffled hash join.
    *
    * Detection: a seeded sample of the big side's keys (one cheap
    * key-only pass over `sampleFraction` of the rows); a key whose
    * scaled-up estimate exceeds `hotRowThreshold` rows is hot. The hot
    * set is bounded by `maxHotKeys` (fail-loud — a join where millions
    * of keys are "hot" isn't skewed, it's big, and needs a different
    * plan). Detection affects ONLY plan shape: whichever keys land in
    * the hot set, both paths compute the same rows, so the result is
    * sample-independent and equals the plain equi join exactly.
    *
    * Routing: the hot-key set (collected, ≤ maxHotKeys rows) splits both
    * sides via a broadcast semi/anti join — hot rows take the salted
    * path, cold rows the plain join — and the union of the two disjoint
    * paths is returned. Inner and left joins, same as [[saltedJoin]];
    * NULL-keyed left rows fall to the cold path where left-join
    * semantics preserve them. With no hot keys detected the plain join
    * is returned untouched (no split, no union). */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16, joinType: String = "inner",
      sampleFraction: Double = 0.05, hotRowThreshold: Long = 100000L,
      maxHotKeys: Int = 10000, seed: Long = 42L): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"auto-salted join supports inner/left, got $joinType")
    val hotRows = detectHotKeys(big, keys, sampleFraction, hotRowThreshold,
      maxHotKeys, seed)
    val keyCols = keys.map(col)
    if (hotRows.isEmpty) big.join(small, keys, joinType)
    else {
      val hotDf = broadcast(
        big.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            java.util.Arrays.asList(hotRows: _*)),
          org.apache.spark.sql.types.StructType(
            keys.map(k => big.schema(k)))))
      val bigHot = big.join(hotDf, keys, "left_semi")
      val bigCold = big.join(hotDf, keys, "left_anti")
      val smallHot = small.join(hotDf, keys, "left_semi")
      val smallCold = small.join(hotDf, keys, "left_anti")
      saltedJoin(bigHot, smallHot, keys, salts, joinType)
        .unionByName(bigCold.join(smallCold, keys, joinType))
    }
  }

  /** Sampled hot-key detection used by [[autoSaltedJoin]], exposed so
    * plan audits (and SQL faces) can assert WHICH keys were classified
    * hot: one key-only pass over `sampleFraction` of `big`; a key whose
    * scaled-up estimate reaches `hotRowThreshold` rows is hot. Returns
    * the collected hot-key rows (≤ maxHotKeys, fail-loud past that —
    * millions of "hot" keys mean the join is uniformly large, not
    * skewed). NULL keys never qualify.
    *
    * Calibration at scale: `hotRowThreshold` is an ABSOLUTE row count —
    * callers should derive it from the table's size (e.g. a fraction of
    * a row-count estimate: `rows / 20` = "a key is hot when it carries
    * ≥5% of the table") rather than hard-coding, or at 100× the data a
    * fixed threshold classifies every key hot and the hot-only refinement
    * silently degrades to blanket salting. */
  def detectHotKeys(big: DataFrame, keys: Seq[String],
      sampleFraction: Double = 0.05, hotRowThreshold: Long = 100000L,
      maxHotKeys: Int = 10000, seed: Long = 42L): Array[org.apache.spark.sql.Row] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val keyCols = keys.map(col)
    val sampled =
      if (sampleFraction >= 1.0) big.select(keyCols: _*)
      else big.select(keyCols: _*).sample(withReplacement = false, sampleFraction, seed)
    val hot = sampled
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= lit(math.max(1L,
        math.ceil(hotRowThreshold * sampleFraction).toLong)))
      .filter(keyCols.map(_.isNotNull).reduce(_ && _))
      .select(keyCols: _*)
    val hotRows = hot.limit(maxHotKeys + 1).collect()
    require(hotRows.length <= maxHotKeys,
      s"more than $maxHotKeys hot keys detected — this join is uniformly " +
        "large, not skewed; raise hotRowThreshold or repartition instead")
    hotRows
  }
}
