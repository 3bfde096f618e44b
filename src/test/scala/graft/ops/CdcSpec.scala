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
}
