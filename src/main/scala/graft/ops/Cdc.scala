package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — change-data-capture between two full snapshots
  * of the same keyed table (the batch-world CDC primitive: given
  * yesterday's load and today's, emit the insert/update/delete stream a
  * log-based CDC source would have produced).
  *
  * Plan shape: ONE full outer sort-merge join on the key columns — both
  * snapshots shuffle exactly once by key, no broadcast of anything
  * SF-scaling, no driver materialization; at 100 TB this is the same
  * topology as the MERGE in etl/Merge.scala. Comparison uses null-safe
  * equality (`<=>`) so NULL→value and value→NULL transitions register as
  * updates, not false equality.
  *
  * Reference semantics: the reference app reloads full extracts per run
  * (main.py upload/transform flow has no notion of deltas); snapshotDiff
  * is what turns those repeated full loads into an incremental pipeline.
  */
object Cdc {

  /** Diff `newSnap` against `oldSnap` on `keys`. Output: key columns,
    * `change_type` ('insert' | 'delete' | 'update'), and for every
    * compared column c both `old_c` and `new_c`. Unchanged rows are
    * omitted (includeUnchanged for audits). `compareCols` defaults to
    * every shared non-key column. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Seq.empty,
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val shared = oldSnap.columns.toSet.intersect(newSnap.columns.toSet)
    keys.foreach(k => require(shared.contains(k), s"key '$k' missing from a snapshot"))
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filter(c => shared.contains(c) && !keys.contains(c)).toSeq
    cols.foreach(c => require(shared.contains(c), s"compare column '$c' missing from a snapshot"))

    val o = oldSnap.select((keys ++ cols).map(col): _*).alias("o")
    val n = newSnap.select((keys ++ cols).map(col): _*).alias("n")
    val on = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val joined = o.join(n, on, "full_outer")

    // key presence: any key null on one side means the row is absent
    // there (keys are non-null by contract of a keyed snapshot)
    val inOld = col(s"o.${keys.head}").isNotNull
    val inNew = col(s"n.${keys.head}").isNotNull
    val changed: Column =
      if (cols.isEmpty) lit(false)
      else cols.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val changeType = when(!inOld, lit("insert"))
      .when(!inNew, lit("delete"))
      .when(changed, lit("update"))
      .otherwise(lit("unchanged"))

    val keyCols = keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    val valCols = cols.flatMap(c =>
      Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    val out = joined.select(keyCols ++ Seq(changeType.as("change_type")) ++ valCols: _*)
    if (includeUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }
}
