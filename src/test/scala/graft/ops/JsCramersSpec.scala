package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class JsCramersSpec extends SparkTestBase {
  import spark.implicits._

  test("jsDrift: identical snapshots have zero divergence in every bin") {
    val df = (1 to 200).map(i => i.toDouble).toDF("v")
    val out = DataQuality.jsDrift(df, df, "v", bins = 10)
      .agg(sum(abs(col("js_nano")))).head().getLong(0)
    assert(out === 0L)
  }

  test("jsFromState: symmetric in its arguments and bounded by ln 2") {
    // disjoint supports: all reference mass in bin 0, all current in bin 9
    val refState = Seq((0L, 1000L)).toDF("bin", "n")
    val curState = Seq((9L, 1000L)).toDF("bin", "n")
    val ab = DataQuality.jsFromState(refState, curState, bins = 10)
      .agg(sum("js_nano")).head().getLong(0)
    val ba = DataQuality.jsFromState(curState, refState, bins = 10)
      .agg(sum("js_nano")).head().getLong(0)
    assert(ab === ba) // JS is symmetric; PSI's ln-ratio asymmetry is gone
    val ln2Nano = math.round(math.log(2.0) * 1e9)
    assert(ab > (0.8 * ln2Nano).toLong && ab <= ln2Nano)
  }

  test("jsFromState: per-day states merge additively (counts are the monoid)") {
    val day1 = Seq((0L, 10L), (1L, 5L)).toDF("bin", "n")
    val day2 = Seq((0L, 7L), (2L, 3L)).toDF("bin", "n")
    val cur = Seq((0L, 17L), (1L, 5L), (2L, 3L)).toDF("bin", "n")
    val merged = DataQuality.jsFromState(day1.unionByName(day2), cur, bins = 4)
    // merged ref == cur exactly -> zero divergence everywhere
    assert(merged.agg(sum(abs(col("js_nano")))).head().getLong(0) === 0L)
  }

  test("cramersV: perfect 2x2 association scores exactly 1") {
    val df = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("y", "w")))
      .toDF("a", "b")
    val r = DataQuality.cramersV(df, "a", "b").head()
    assert(r.getLong(0) === 10L)       // n_rows
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 10000000L) // chi2 = 10 exactly, micro
    assert(r.getLong(4) === 1000000L)  // V = 1
  }

  test("cramersV: exact independence scores 0") {
    val df = Seq(("x", "u"), ("x", "w"), ("y", "u"), ("y", "w")).toDF("a", "b")
    val r = DataQuality.cramersV(df, "a", "b").head()
    assert(r.getLong(3) === 0L && r.getLong(4) === 0L)
  }

  test("cramersV: NULL is a real category level; single-level V is NULL") {
    val withNull = Seq((Some("x"), "u"), (None, "w"), (None, "w"))
      .toDF("a", "b")
    val r = DataQuality.cramersV(withNull, "a", "b").head()
    assert(r.getLong(1) === 2L) // "x" and the NULL sentinel
    val degenerate = Seq(("x", "u"), ("x", "w")).toDF("a", "b")
    val d = DataQuality.cramersV(degenerate, "a", "b").head()
    assert(d.getLong(3) === 0L) // chi2 exact 0 for a constant column
    assert(d.isNullAt(4))       // V undefined at min(r-1, c-1) = 0
  }

  test("cramersV: 2x2 with known chi2 — exact integer cells") {
    // contingency [[3, 1], [1, 3]]: n=8, all marginals 4
    // cell d = 8*3 - 16 = 8 or 8*1 - 16 = -8; den = 8*16 = 128
    // cell chi2 = 64/128 = 0.5 each -> chi2 = 2, V = sqrt(2/8) = 0.5
    val df = (Seq.fill(3)(("x", "u")) ++ Seq(("x", "w")) ++
      Seq(("y", "u")) ++ Seq.fill(3)(("y", "w"))).toDF("a", "b")
    val r = DataQuality.cramersV(df, "a", "b").head()
    assert(r.getLong(3) === 2000000L)
    assert(r.getLong(4) === 500000L)
  }
}
