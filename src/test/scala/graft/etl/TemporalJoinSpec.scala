package graft.etl

import graft.SparkTestBase

/** Point-in-time join against an SCD2 dimension (Merge.temporalJoin). */
class TemporalJoinSpec extends SparkTestBase {

  import spark.implicits._

  // key 1: two versions [0,100) -> "a1", [100,∞) -> "a2"
  // key 2: one open version [50,∞) -> "b1" (facts before 50 miss)
  // key 9: absent from the dimension entirely
  private def dim = Seq(
    (1L, "a1", 0L, Some(100L)),
    (1L, "a2", 100L, None),
    (2L, "b1", 50L, None)
  ).toDF("k", "attr", "valid_from", "valid_to")
    .select($"k", $"attr", $"valid_from", $"valid_to".cast("long"))

  test("each fact gets exactly the version valid at its time") {
    val facts = Seq(
      (10L, 1L, 0L),   // at v1 start -> a1
      (11L, 1L, 99L),  // last tick of v1 -> a1
      (12L, 1L, 100L), // v2 boundary is inclusive-from -> a2
      (13L, 1L, 5000L) // open version -> a2
    ).toDF("fid", "k", "ts")
    val got = Merge.temporalJoin(facts, dim, Seq("k"), "ts")
      .select("fid", "attr").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((10L, "a1"), (11L, "a1"), (12L, "a2"), (13L, "a2")))
  }

  test("facts before the first version or on unknown keys survive with NULLs") {
    val facts = Seq(
      (20L, 2L, 10L), // predates key 2's first version
      (21L, 2L, 50L), // exactly at valid_from -> b1
      (22L, 9L, 10L)  // unknown key
    ).toDF("fid", "k", "ts")
    val got = Merge.temporalJoin(facts, dim, Seq("k"), "ts")
      .select("fid", "attr").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(got.toSeq === Seq((20L, None), (21L, Some("b1")), (22L, None)))
  }

  test("row count is preserved — disjoint intervals never multiply facts") {
    val facts = (0L until 500L).map(i => (i, 1L + i % 2, i % 300)).toDF("fid", "k", "ts")
    assert(Merge.temporalJoin(facts, dim, Seq("k"), "ts").count() === 500L)
    // inner join drops only the genuinely unmatched
    val inner = Merge.temporalJoin(facts, dim, Seq("k"), "ts", joinType = "inner")
    val expected = facts.as[(Long, Long, Long)].collect().count {
      case (_, 1L, _) => true // key 1 covered on [0,∞)
      case (_, 2L, ts) => ts >= 50L
      case _ => false
    }
    assert(inner.count() === expected.toLong)
  }

  test("column collisions with dimension attributes fail loud") {
    val facts = Seq((1L, 1L, 0L)).toDF("fid", "k", "attr")
    intercept[IllegalArgumentException] {
      Merge.temporalJoin(facts, dim, Seq("k"), "fid")
    }
  }
}
