package graft.ops

import graft.SparkTestBase

class ModeSpec extends SparkTestBase {
  import spark.implicits._

  test("modePerGroup: clear winner and smallest-value tie-break on numerics") {
    val df = Seq(
      (1L, 5L), (1L, 5L), (1L, 9L),            // g=1: 5 wins 2-1
      (2L, 7L), (2L, 3L), (2L, 7L), (2L, 3L)   // g=2: 3 and 7 tie -> 3
    ).toDF("g", "v")
    val got = Relational.modePerGroup(df, Seq("g"), "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((5L, 2L)), 2L -> ((3L, 2L))))
  }

  test("modePerGroup: STRING values tie-break lexicographically, not by numeric cast") {
    // categorical mode — the most common use. A `-1 * value` tie-break
    // would cast these to double (NULL), making tied structs compare
    // equal and the winner partitioning-dependent; the struct-field
    // tie-break must pick the lexicographically smallest value.
    val df = Seq(
      (1L, "pear"), (1L, "apple"), (1L, "pear"), (1L, "apple"), (1L, "quince"),
      (2L, "b"), (2L, "b"), (2L, "a")
    ).toDF("g", "v")
    // spread across many partitions so a partitioning-dependent answer
    // would have room to go wrong
    val got = Relational.modePerGroup(df.repartition(8), Seq("g"), "v").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> (("apple", 2L)), 2L -> (("b", 2L))))
  }

  test("modePerGroup: deterministic across partitionings") {
    val rows = (0 until 2000).map(i => (i % 5L, s"cat_${i % 40 / (i % 5 + 1)}"))
    val a = Relational.modePerGroup(rows.toDF("g", "v").repartition(2), Seq("g"), "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = Relational.modePerGroup(rows.toDF("g", "v").repartition(17), Seq("g"), "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
