package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) and data profiling — the load-side staples an
  * ETL engine needs that OSS Spark only ships inside lakehouse table
  * formats.
  */
object Merge {

  /** SQL-MERGE semantics over plain DataFrames: rows whose key appears
    * in `updates` are REPLACED WHOLE (an explicit NULL in an update row
    * overwrites, exactly like MERGE ... UPDATE SET *), rows only in
    * `target` survive unchanged, rows only in `updates` are inserted.
    *
    * One full-outer shuffle join on the key — the minimal possible cost
    * for an unpartitioned upsert. At scale, point the same call at
    * bucketed/co-partitioned tables and the shuffle disappears (see
    * Sinks bucketing); Delta/Iceberg-style deletion vectors are a
    * storage-layer concern, deliberately out of scope.
    *
    * Requires both frames to share the schema (same columns). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: ${target.columns.toSeq} vs ${updates.columns.toSeq}")
    requireUniqueKeys(updates, keys, "upsert")
    val t = target.as("t")
    val u = updates.as("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    // a non-null key on the update side marks "row came from updates";
    // keys are non-null by definition of an upsert key
    val fromUpdates = col(s"u.${keys.head}").isNotNull
    t.join(u, cond, "full_outer")
      .select(target.columns.map { c =>
        when(fromUpdates, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
      }.toSeq: _*)
  }

  /** Type-2 slowly-changing-dimension merge: history rows carry
    * [`validFrom`, `validTo`) intervals, the open row per key has
    * `validTo` NULL. An update whose tracked attributes differ from the
    * key's open row CLOSES it (validTo = update's validFrom) and opens a
    * new row; identical updates are no-ops; unknown keys insert a new
    * open row. Closed history is untouched.
    *
    * `updates` schema: keys ++ trackedCols ++ validFrom. One full-outer
    * shuffle join on the key against the OPEN slice only (closed history
    * unions back untouched — at scale that's the overwhelming majority
    * of rows, never shuffled). Null-safe comparison (`<=>`) so NULL
    * attribute transitions count as changes. */
  def scd2(current: DataFrame, updates: DataFrame, keys: Seq[String],
      trackedCols: Seq[String], validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    requireUniqueKeys(updates, keys, "scd2")
    val outCols = keys ++ trackedCols ++ Seq(validFrom, validTo)
    val closed = current.filter(col(validTo).isNotNull).select(outCols.map(col): _*)
    val open = current.filter(col(validTo).isNull)
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val j = open.as("t").join(updates.as("u"), cond, "full_outer")
    val matched = col(s"u.${keys.head}").isNotNull && col(s"t.${keys.head}").isNotNull
    val changed = matched &&
      trackedCols.map(c => !(col(s"t.$c") <=> col(s"u.$c"))).reduce(_ || _)
    val nullTo = lit(null).cast(updates.schema(validFrom).dataType)
    val closedNow = j.filter(changed).select(
      (keys ++ trackedCols).map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$validFrom").as(validFrom), col(s"u.$validFrom").as(validTo)): _*)
    val stillOpen = j.filter(!changed && col(s"t.${keys.head}").isNotNull).select(
      (keys ++ trackedCols).map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$validFrom").as(validFrom), nullTo.as(validTo)): _*)
    val newOpen = j.filter(changed || col(s"t.${keys.head}").isNull).select(
      (keys ++ trackedCols).map(c => col(s"u.$c").as(c)) ++
        Seq(col(s"u.$validFrom").as(validFrom), nullTo.as(validTo)): _*)
    closed.unionByName(closedNow).unionByName(stillOpen).unionByName(newOpen)
  }

  /** Point-in-time (temporal) join: attach to each fact row the SCD2
    * dimension version valid at the fact's event time —
    * `fact.ts >= valid_from AND (valid_to IS NULL OR fact.ts < valid_to)`.
    *
    * The equi-key condition drives the join (broadcast for small dims,
    * shuffle on the key otherwise); the interval test is a join residual.
    * Because SCD2 intervals are disjoint per key, each fact matches at
    * most ONE version — no post-join dedup, no row multiplication, and
    * the per-key probe cost is the key's version count (a handful), not
    * its fact count. Left join by default so facts that predate every
    * version (or reference an unknown key) survive with NULL attributes.
    *
    * Dimension columns (minus the keys) are appended; names must not
    * collide with fact columns. */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
      factTime: String, validFrom: String = "valid_from",
      validTo: String = "valid_to", joinType: String = "left"): DataFrame = {
    val dimCols = dim.columns.filterNot(keys.contains)
    val collide = dimCols.toSet.intersect(facts.columns.toSet)
    require(collide.isEmpty, s"temporalJoin: column collision on $collide")
    val f = facts.as("f")
    val d = dim.as("d")
    val keyCond = keys.map(k => col(s"f.$k") <=> col(s"d.$k")).reduce(_ && _)
    val timeCond = col(s"f.$factTime") >= col(s"d.$validFrom") &&
      (col(s"d.$validTo").isNull || col(s"f.$factTime") < col(s"d.$validTo"))
    f.join(d, keyCond && timeCond, joinType)
      .select(facts.columns.map(c => col(s"f.$c").as(c)).toSeq ++
        dimCols.map(c => col(s"d.$c").as(c)): _*)
  }

  /** SQL MERGE raises "multiple source rows matched" for duplicate-key
    * updates; silently joining them would MULTIPLY target rows instead of
    * upserting. One cheap aggregation over the (small) update side. */
  private def requireUniqueKeys(updates: DataFrame, keys: Seq[String], op: String): Unit = {
    val dups = updates.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    if (dups > 0) throw new IllegalArgumentException(
      s"$op: updates contain duplicate keys on (${keys.mkString(", ")}) — " +
        "deduplicate the update set first (e.g. keep max-timestamp per key)")
  }

  /** One-pass column profile: per column, null count and exact distinct
    * count, plus the row total — the expectations/data-quality summary
    * run before a load is accepted. A single aggregation (Spark expands
    * the multi-distinct internally); no per-column jobs, no driver
    * loops.
    *
    * Output: (col_name, n_rows, n_nulls, n_distinct) one row per column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")) ++
        cols.map(c => countDistinct(col(c)).as(s"__dist_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__dist_$c").as("n_distinct"))
    }: _*)).as("__p")).select("__p.*")
  }
}
