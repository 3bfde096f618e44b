package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IncrementalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq

  test("maintain equals the full recompute over the reconstituted inputs") {
    val aOld = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("id", "k")
    val aNew = Seq((4L, 20L), (5L, 30L)).toDF("id", "k")
    val bOld = Seq((10L, "x"), (20L, "y")).toDF("k", "s")
    val bNew = Seq((30L, "z"), (40L, "w")).toDF("k", "s")
    val view = aOld.join(bOld, Seq("k")).select($"id", $"k", $"s")
    val got = IncrementalJoin.maintain(view, aOld, aNew, bOld, bNew, Seq("k"))
      .select($"id", $"k", $"s")
    val full = aOld.unionByName(aNew).join(bOld.unionByName(bNew), Seq("k"))
      .select($"id", $"k", $"s")
    assert(canon(got) === canon(full))
    assert(canon(got).nonEmpty)
  }

  test("joinDelta emits only the new rows (no double counting of the old view)") {
    val aOld = Seq((1L, 10L)).toDF("id", "k")
    val aNew = Seq((2L, 10L)).toDF("id", "k")
    val bOld = Seq((10L, "x")).toDF("k", "s")
    val bNew = Seq((10L, "x2")).toDF("k", "s")
    val delta = IncrementalJoin.joinDelta(aOld, aNew, bOld, bNew, Seq("k"))
      .select($"id", $"k", $"s")
    // new pairs: (2,x) from dA*B, (1,x2) from A*dB, (2,x2) from dA*dB
    assert(canon(delta) === Seq((1L, 10L, "x2"), (2L, 10L, "x"), (2L, 10L, "x2")))
  }

  test("delta terms plan as broadcast joins") {
    val aOld = (1L to 100L).map(i => (i, i % 10)).toDF("id", "k")
    val aNew = Seq((101L, 1L)).toDF("id", "k")
    val bOld = (0L until 10L).map(k => (k, s"v$k")).toDF("k", "s")
    val bNew = Seq((999L, "n")).toDF("k", "s")
    val plan = IncrementalJoin.joinDelta(aOld, aNew, bOld, bNew, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // no sort-merge shuffle join should appear for the delta terms
    assert(!plan.contains("SortMergeJoin"))
  }
}
