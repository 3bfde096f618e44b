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

  /** Engine-portable 60-bit row hash: md5 over a NUL-sentinel encoding
    * (`concat_ws` alone would conflate NULL with absence). Used instead
    * of xxhash64 so an external system (or the DuckDB oracle) can
    * recompute identical digests from SQL alone. Callers hash columns
    * whose string rendering is engine-stable (ints/longs/strings/dates);
    * raw doubles can format differently across engines. */
  def portableRowHash(cols: Seq[String]): Column = {
    val payload = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002NULL"))): _*)
    conv(substring(md5(payload), 1, 15), 16, 10).cast("long")
  }

  /** Merkle-style bucket fingerprint of a keyed snapshot: N rows of
    * (bucket, n_rows, digest) where digest = XOR of per-row hashes.
    * XOR is commutative/associative, so the digest is independent of
    * partitioning and row order, and the shuffle this plan performs is
    * `buckets` rows — NOT the table. Comparing two 100 TB replicas
    * costs one scan each plus a joined compare of two tiny frames.
    *
    * Contract: `keys` identify rows uniquely (a keyed snapshot), so
    * XOR-cancellation of identical full-row hashes cannot occur within
    * one table; cross-table cancellation of two compensating edits in
    * one bucket is a ~2^-60 event, and `n_rows` independently catches
    * any insert/delete imbalance. */
  def tableDigest(df: DataFrame, keys: Seq[String], buckets: Int = 1024,
      hashCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty && buckets > 0)
    val cols = if (hashCols.nonEmpty) hashCols else df.columns.toSeq
    df.select(
        pmod(portableRowHash(keys), lit(buckets.toLong)).cast("int").as("bucket"),
        portableRowHash(cols).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1L)).as("n_rows"), expr("bit_xor(h)").as("digest"))
  }

  /** Buckets whose digest or row count differ between two snapshots.
    * Full outer on bucket id so buckets present on one side only (mass
    * insert/delete) surface too. Output is at most `buckets` rows. */
  def digestDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      buckets: Int = 1024, hashCols: Seq[String] = Seq.empty): DataFrame = {
    val o = tableDigest(oldSnap, keys, buckets, hashCols).alias("o")
    val n = tableDigest(newSnap, keys, buckets, hashCols).alias("n")
    o.join(n, col("o.bucket") === col("n.bucket"), "full_outer")
      .filter(!(col("o.digest") <=> col("n.digest")) ||
        !(col("o.n_rows") <=> col("n.n_rows")))
      .select(coalesce(col("o.bucket"), col("n.bucket")).as("bucket"),
        col("o.n_rows").as("old_n"), col("n.n_rows").as("new_n"),
        col("o.digest").as("old_digest"), col("n.digest").as("new_digest"))
  }

  /** Digest-then-drill diff: identify dirty buckets from the digests,
    * then run the exact row-level snapshotDiff ONLY over those buckets
    * (broadcast semi join on the tiny dirty-bucket set — the full-table
    * key shuffle of a naive diff happens over the dirty slice alone).
    * For replica verification where changes are sparse — the common
    * case — this replaces a 2×100 TB shuffle with two scans plus a
    * shuffle proportional to the changed fraction. */
  def drillDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      buckets: Int = 1024, compareCols: Seq[String] = Seq.empty): DataFrame = {
    val dirty = digestDiff(oldSnap, newSnap, keys, buckets).select("bucket")
    def slice(df: DataFrame): DataFrame = df
      .withColumn("__bucket",
        pmod(portableRowHash(keys), lit(buckets.toLong)).cast("int"))
      .join(broadcast(dirty), col("__bucket") === col("bucket"), "left_semi")
      .drop("__bucket")
    snapshotDiff(slice(oldSnap), slice(newSnap), keys, compareCols)
  }
}
