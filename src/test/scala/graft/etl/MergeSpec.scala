package graft.etl

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {

  import spark.implicits._

  test("upsert: update replaces whole row (NULLs overwrite), insert appends") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq(
      (2L, null.asInstanceOf[String], 99.0), // whole-row replace: s -> NULL
      (4L, "d", 40.0) // new key
    ).toDF("k", "s", "v")
    val got = Merge.upsert(target, updates, Seq("k")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, Some("a"), 10.0),
      (2L, None, 99.0), // SQL MERGE semantics: explicit NULL wins
      (3L, Some("c"), 30.0),
      (4L, Some("d"), 40.0)))
  }

  test("upsert accepts same columns in a different order") {
    val t = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val u = Seq((5.0, "z", 2L)).toDF("v", "s", "k")
    val got = Merge.upsert(t, u, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 1.0), (2L, "z", 5.0)))
  }

  test("upsert and scd2 reject duplicate update keys like SQL MERGE") {
    val t = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val dup = Seq((1L, "x", 2.0), (1L, "y", 3.0)).toDF("k", "s", "v")
    intercept[IllegalArgumentException] { Merge.upsert(t, dup, Seq("k")) }
    val cur = Seq((1L, "a", 0L, None.asInstanceOf[Option[Long]]))
      .toDF("k", "attr", "valid_from", "valid_to")
      .select($"k", $"attr", $"valid_from", $"valid_to".cast("long"))
    val dupU = Seq((1L, "x", 10L), (1L, "y", 10L)).toDF("k", "attr", "valid_from")
    intercept[IllegalArgumentException] { Merge.scd2(cur, dupU, Seq("k"), Seq("attr")) }
  }

  test("upsert rejects mismatched schemas") {
    val t = Seq((1L, "a")).toDF("k", "s")
    val u = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Merge.upsert(t, u, Seq("k"))
    }
  }

  test("scd2: close-and-open on change, no-op on identical, insert on new key") {
    val current = Seq(
      (1L, "a", 0L, Some(50L)), // closed history
      (1L, "b", 50L, None), // open
      (2L, "c", 0L, None), // open, will get identical update
      (3L, "d", 0L, None) // open, no update at all
    ).toDF("k", "attr", "valid_from", "valid_to")
      .select($"k", $"attr", $"valid_from", $"valid_to".cast("long"))
    val updates = Seq(
      (1L, "B2", 100L), // changed -> close + open
      (2L, "c", 100L), // identical -> no-op
      (9L, "z", 100L) // new key -> insert open
    ).toDF("k", "attr", "valid_from")
    val got = Merge.scd2(current, updates, Seq("k"), Seq("attr")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(t => (t._1, t._4.getOrElse(Long.MaxValue)))
    assert(got.toSeq === Seq(
      (1L, "a", 0L, Some(50L)), // untouched closed history
      (1L, "b", 50L, Some(100L)), // closed by the update
      (1L, "B2", 100L, None), // new open version
      (2L, "c", 0L, None), // identical update: untouched
      (3L, "d", 0L, None), // no update: untouched
      (9L, "z", 100L, None))) // inserted
  }

  test("profile: nulls, distincts, and totals in one pass") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None), (Some(2L), Some("y")), (None, Some("x"))
    ).toDF("a", "b")
    val got = Merge.profile(df, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a", 4L, 1L, 2L), // distinct excludes null
      ("b", 4L, 1L, 2L)))
  }
}
