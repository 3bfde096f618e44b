package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies inserts, deletes, updates; omits unchanged") {
    val oldSnap = Seq(
      (1L, "a", 10.0), // unchanged
      (2L, "b", 20.0), // updated value
      (3L, "c", 30.0)  // deleted
    ).toDF("k", "s", "v")
    val newSnap = Seq(
      (1L, "a", 10.0),
      (2L, "b", 25.0),
      (4L, "d", 40.0)  // inserted
    ).toDF("k", "s", "v")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("NULL transitions register as updates (null-safe compare)") {
    val oldSnap = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("z")))
      .toDF("k", "s")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option("y")), (3L, Option("z")))
      .toDF("k", "s")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "update", 2L -> "update"))
  }

  test("includeUnchanged keeps identical rows with the 'unchanged' tag") {
    val snap = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val out = Cdc.snapshotDiff(snap, snap, Seq("k"), includeUnchanged = true)
    assert(out.filter(col("change_type") === "unchanged").count() === 2L)
    assert(Cdc.snapshotDiff(snap, snap, Seq("k")).count() === 0L)
  }

  test("composite keys and old_/new_ value columns") {
    val oldSnap = Seq((1L, "x", 10)).toDF("k1", "k2", "v")
    val newSnap = Seq((1L, "x", 11)).toDF("k1", "k2", "v")
    val rows = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k1", "k2")).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getAs[String]("change_type") === "update")
    assert(r.getAs[Int]("old_v") === 10 && r.getAs[Int]("new_v") === 11)
  }

  // --- bucket-digest fingerprint + drill diff -------------------------

  private def snap(n: Int, mutate: Long => Option[(String, Double)]) =
    (1L to n.toLong).flatMap { k =>
      mutate(k).map { case (s, v) => (k, s, v) }
    }.toDF("k", "s", "v")

  test("tableDigest is order- and partitioning-independent") {
    val a = snap(1000, k => Some((s"s$k", k * 1.5)))
    val b = a.orderBy(rand(42)).repartition(13)
    val da = Cdc.tableDigest(a, Seq("k"), buckets = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val db = Cdc.tableDigest(b, Seq("k"), buckets = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(da.toSeq === db.toSeq)
    assert(da.map(_._2).sum === 1000L)
  }

  test("digestDiff flags only buckets containing changes") {
    val a = snap(1000, k => Some((s"s$k", k * 1.5)))
    val b = snap(1000, k => Some((if (k == 500) "CHANGED" else s"s$k", k * 1.5)))
    val dirty = Cdc.digestDiff(a, b, Seq("k"), buckets = 16).collect()
    assert(dirty.length === 1)
    // identical snapshots -> zero dirty buckets
    assert(Cdc.digestDiff(a, a, Seq("k"), buckets = 16).count() === 0L)
  }

  test("drillDiff equals the full snapshotDiff on scattered mutations") {
    val a = snap(2000, k => Some((s"s$k", k * 1.5)))
    val b = snap(2000, k =>
      if (k % 97 == 0) None // deletes
      else if (k % 89 == 0) Some((s"s$k!", k * 1.5)) // updates
      else Some((s"s$k", k * 1.5)))
      .unionByName(Seq((9001L, "new", 1.0), (9002L, "new", 2.0)).toDF("k", "s", "v"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity(_)).toSeq
    val full = canon(Cdc.snapshotDiff(a, b, Seq("k")).select("k", "change_type"))
    val drilled = canon(Cdc.drillDiff(a, b, Seq("k"), buckets = 32).select("k", "change_type"))
    assert(full.nonEmpty && drilled === full)
  }
}
