package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("quantileBinsDiscrete: balanced bins, deterministic ties, full coverage") {
    // 1000 rows over 10 discrete values, 100 each -> k=5 bins of 200
    val df = (0 until 1000).map(i => (i.toLong, (i % 10).toLong)).toDF("id", "v")
    val binned = Features.quantileBinsDiscrete(df, "v", k = 5, binCol = "bin")
    val sizes = binned.groupBy("bin").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(sizes.toSeq === Seq((0, 200L), (1, 200L), (2, 200L), (3, 200L), (4, 200L)))
    // same value -> same bin, bins ordered by value
    val vb = binned.select("v", "bin").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(vb.map(_._2).toSeq === vb.map(_._2).sorted.toSeq)
    assert(vb.length === 10)
  }

  test("quantileBinsDiscrete: a dominant value owns its bin span") {
    // value 0 has 90% of the mass -> values 1..9 all squeeze into the top bin
    val df = ((0 until 900).map(_ => 0L) ++ (1L to 9L)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val vb = Features.quantileBinsDiscrete(df, "v", k = 4, binCol = "bin")
      .select("v", "bin").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(vb(0L) === 0) // cum_before = 0
    (1L to 9L).foreach(v => assert(vb(v) === 3)) // cum_before >= 900/909 * 4
  }

  test("quantileBinsDiscrete: NULLs keep their rows, get a NULL bin, and never shift boundaries") {
    // 400 non-null rows over values 0..3 (100 each) + 200 NULL rows.
    // If the NULL group entered the histogram it would sort first and
    // push every non-null value up ~k*200/600 bins; if the join back
    // were inner, the 200 NULL rows would vanish.
    val rows = (0 until 400).map(i => (i.toLong, Some((i % 4).toLong))) ++
      (400 until 600).map(i => (i.toLong, Option.empty[Long]))
    val df = rows.toDF("id", "v")
    val binned = Features.quantileBinsDiscrete(df, "v", k = 4, binCol = "bin")
    assert(binned.count() === 600L, "NULL-valued rows must survive binning")
    assert(binned.filter(col("v").isNull && col("bin").isNull).count() === 200L)
    // non-null boundaries are computed over the 400 non-null rows only:
    // 4 values x 100 rows into k=4 -> exactly one value per bin
    val vb = binned.filter(col("v").isNotNull).select("v", "bin").distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(vb === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("targetEncode shrinks rare categories toward the global mean") {
    // cat "big": 100 rows mean 10; cat "rare": 1 row value 1000
    val df = ((1 to 100).map(_ => ("big", 10.0)) :+ (("rare", 1000.0)))
      .toDF("cat", "y")
    val enc = Features.targetEncode(df, "cat", "y", smoothing = 10.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val globalMean = (100 * 10.0 + 1000.0) / 101
    val expBig = (100 * 10.0 + 10 * globalMean) / 110
    val expRare = (1000.0 + 10 * globalMean) / 11
    assert(enc("big")._1 === 100L)
    assert(math.abs(enc("big")._2 - expBig) < 1e-9)
    assert(math.abs(enc("rare")._2 - expRare) < 1e-9)
    // rare is pulled most of the way from 1000 toward the prior
    assert(enc("rare")._2 < 120 && enc("rare")._2 > globalMean)
  }

  test("targetEncode with zero smoothing is the plain per-category mean") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("cat", "y")
    val enc = Features.targetEncode(df, "cat", "y", smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(enc("a") - 2.0) < 1e-12 && math.abs(enc("b") - 10.0) < 1e-12)
  }

  test("quantileTransform: mid-rank percentiles, min 0, max 1e6, tied block averaged") {
    import spark.implicits._
    // values [10, 20, 20, 30]: n=4, den=6 → 10→0, 20→(2·1+2−1)·1e6/6=500000, 30→1e6
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)).toDF("id", "v")
    val got = Features.quantileTransform(df, "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pct_micro")).toMap
    assert(got === Map(1L -> 0L, 2L -> 500000L, 3L -> 500000L, 4L -> 1000000L))
  }

  test("quantileTransform: NULL keeps its row with NULL pct; single value degenerates to 0") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(9L))).toDF("id", "v")
    val got = Features.quantileTransform(df, "v")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("pct_micro"))).toMap
    assert(got === Map(1L -> Some(0L), 2L -> None, 3L -> Some(1000000L)))
    val single = Features.quantileTransform(
        Seq((1L, 7L), (2L, 7L)).toDF("id", "v"), "v")
      .collect().map(_.getAs[Long]("pct_micro")).toSeq
    // n=2 all tied: num = 2·0+2−1 = 1, den = 2 → 500000 each
    assert(single === Seq(500000L, 500000L))
    val one = Features.quantileTransform(Seq((1L, 7L)).toDF("id", "v"), "v")
      .collect().map(_.getAs[Long]("pct_micro")).toSeq
    assert(one === Seq(0L))
  }

  test("quantileTransform off merged histogram state == direct; absent value gets NULL") {
    import spark.implicits._
    val part1 = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val part2 = Seq((3L, 20L), (4L, 30L)).toDF("id", "v")
    val full = part1.union(part2)
    val merged = Features.mergeValueHistograms(
      Features.valueHistogram(part1, "v"), Features.valueHistogram(part2, "v"))
    val fromState = Features.quantileTransformFromState(full, "v", merged)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pct_micro")).toMap
    val direct = Features.quantileTransform(full, "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pct_micro")).toMap
    assert(fromState === direct)
    // a value the state never saw has no percentile position
    val unseen = Features.quantileTransformFromState(
        Seq((9L, 99L)).toDF("id", "v"), "v", merged)
      .collect().map(r => Option(r.getAs[Any]("pct_micro"))).toSeq
    assert(unseen === Seq(None))
  }

  test("standardize: hand-computed z-scores, population sigma (ddof=0)") {
    // group g: 1, 2, 3 -> mu=2, sigma=sqrt(2/3); z(3)=sqrt(3/2)=1.2247449
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0))
      .toDF("k", "id", "v")
    val got = Features.standardize(df, "k", "v")
      .orderBy("id").collect().map(_.getLong(3))
    assert(got.toSeq === Seq(-1224745L, 0L, 1224745L))
  }

  test("standardize: NULL value, singleton group, constant group all NULL z") {
    val df = Seq(
      ("solo", 1L, Some(5.0)),
      ("const", 2L, Some(4.0)), ("const", 3L, Some(4.0)),
      ("ok", 4L, Some(1.0)), ("ok", 5L, Some(2.0)), ("ok", 6L, None)
    ).toDF("k", "id", "v")
    val z = Features.standardize(df, "k", "v").orderBy("id")
      .collect().map(r => Option(r.getAs[Any]("z_micro"))).toSeq
    assert(z(0) === None)            // singleton: no scale
    assert(z(1) === None && z(2) === None) // constant: sigma 0
    assert(z(3).isDefined && z(4).isDefined)
    assert(z(5) === None)            // NULL value stays NULL
    // two-point group: z = ±1 exactly (each point one sigma from mu)
    assert(z(3) === Some(-1000000L) && z(4) === Some(1000000L))
  }

  test("standardize: groups are independent and the stats join broadcasts") {
    val df = Seq(("a", 1L, 0.0), ("a", 2L, 10.0), ("b", 3L, 100.0),
      ("b", 4L, 300.0)).toDF("k", "id", "v")
    val out = Features.standardize(df, "k", "v")
    val z = out.orderBy("id").collect().map(_.getLong(3))
    assert(z.toSeq === Seq(-1000000L, 1000000L, -1000000L, 1000000L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"stats must broadcast back, got:\n$plan")
  }
}
