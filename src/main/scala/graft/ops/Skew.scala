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
}
