package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted aggregation equals plain group-by on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val df = (Seq.fill(10000)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .map { case (k, i) => (k, i.toDouble) }.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,6)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(salted === plain)
  }

  test("partial stage spreads the hot key over multiple groups") {
    import spark.implicits._
    val df = Seq.fill(5000)(("hot", 1.0)).toDF("k", "v").repartition(8)
    val partialGroups = df
      .withColumn("__salt",
        pmod(xxhash64(col("v"), spark_partition_id(), monotonically_increasing_id()), lit(8)))
      .groupBy("k", "__salt").count().count()
    assert(partialGroups > 1, "salt must split the hot key")
  }

  test("saltedJoin equals the plain join, inner and left") {
    import spark.implicits._
    // hot key 1 with 2000 rows; key 9 misses the dimension
    val big = ((1 to 2000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L), (9L, 3L))).toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused")).toDF("k", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    val inner = canon(Skew.saltedJoin(big, dim, Seq("k"), salts = 8))
    assert(inner === canon(big.join(dim, Seq("k"))))
    assert(inner.length === 2002)
    val left = canon(Skew.saltedJoin(big, dim, Seq("k"), salts = 8, joinType = "left"))
    assert(left === canon(big.join(dim, Seq("k"), "left")))
    assert(left.length === 2003) // key 9 survives NULL-padded
    // the hot key genuinely spreads across salt groups
    val spread = big.withColumn("__salt",
        pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(8L)).cast("int"))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("autoSaltedJoin equals the plain join with hot, cold, and missing keys") {
    import spark.implicits._
    // key 1: 3000 rows (hot); keys 100-199: 10 rows each (cold);
    // key 9999: misses the dimension entirely
    val big = ((1 to 3000).map(i => (1L, i.toLong)) ++
      (for (k <- 100 until 200; i <- 0 until 10) yield (k.toLong, i.toLong)) ++
      Seq((9999L, 0L))).toDF("k", "payload").repartition(8)
    val dim = ((Seq(1L) ++ (100L until 200L)).map(k => (k, s"attr$k")))
      .toDF("k", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    // full-scan detection (fraction 1.0) with a threshold between the
    // cold counts (10) and the hot count (3000): exactly key 1 is hot
    val auto = Skew.autoSaltedJoin(big, dim, Seq("k"), salts = 8,
      sampleFraction = 1.0, hotRowThreshold = 500L)
    assert(canon(auto) === canon(big.join(dim, Seq("k"))))
    val left = Skew.autoSaltedJoin(big, dim, Seq("k"), salts = 8,
      joinType = "left", sampleFraction = 1.0, hotRowThreshold = 500L)
    assert(canon(left) === canon(big.join(dim, Seq("k"), "left")))
    // sampled detection still returns the exact join result (detection
    // only moves keys between the two paths)
    val sampled = Skew.autoSaltedJoin(big, dim, Seq("k"), salts = 8,
      sampleFraction = 0.2, hotRowThreshold = 500L, seed = 7L)
    assert(canon(sampled) === canon(big.join(dim, Seq("k"))))
  }

  test("autoSaltedJoin with no hot keys returns the untouched plain join") {
    import spark.implicits._
    val big = (for (k <- 0 until 50; i <- 0 until 4) yield (k.toLong, i.toLong))
      .toDF("k", "payload")
    val dim = (0L until 50L).map(k => (k, s"a$k")).toDF("k", "attr")
    val auto = Skew.autoSaltedJoin(big, dim, Seq("k"),
      sampleFraction = 1.0, hotRowThreshold = 1000L)
    // no split: the plan contains no salt column and no union
    val plan = auto.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__salt") && !plan.toLowerCase.contains("union"))
    assert(auto.count() === 200L)
  }

  test("autoSaltedJoin fails loud when 'hot' keys exceed the bound") {
    import spark.implicits._
    val big = (for (k <- 0 until 300; i <- 0 until 5) yield (k.toLong, i.toLong))
      .toDF("k", "payload")
    val dim = (0L until 300L).map(k => (k, s"a$k")).toDF("k", "attr")
    val e = intercept[IllegalArgumentException] {
      Skew.autoSaltedJoin(big, dim, Seq("k"), sampleFraction = 1.0,
        hotRowThreshold = 2L, maxHotKeys = 100)
    }
    assert(e.getMessage.contains("hot keys"))
  }

  test("autoSaltedJoin salts only the hot path") {
    import spark.implicits._
    val big = ((1 to 2000).map(i => (1L, i.toLong)) ++
      (for (k <- 10 until 20; i <- 0 until 5) yield (k.toLong, i.toLong)))
      .toDF("k", "payload").repartition(4)
    val dim = (Seq(1L) ++ (10L until 20L)).map(k => (k, s"a$k")).toDF("k", "attr")
    val auto = Skew.autoSaltedJoin(big, dim, Seq("k"), salts = 8,
      sampleFraction = 1.0, hotRowThreshold = 100L)
    val plan = auto.queryExecution.optimizedPlan.toString
    // the split happened: a union of the salted hot path and a plain path
    assert(plan.toLowerCase.contains("union"))
    assert(plan.contains("__salt"))
    assert(auto.count() === 2050L)
  }

  test("detectHotKeys with a size-derived threshold isolates the hot key at 10x spreads") {
    import spark.implicits._
    // the q_auto_skew_join shape: key 0 carries ~30% of rows, 97 cold
    // keys share the rest (~0.7% each). A size-derived threshold
    // (rows/20 = "hot means ≥5% of the table") must classify EXACTLY
    // key 0 hot at any scale — a fixed absolute threshold passes small
    // and silently flips every cold key hot once the data grows.
    for (n <- Seq(2000, 20000)) {
      val big = (0 until n).map { i =>
        val k = if (i % 10 < 3) 0L else (i % 97).toLong + 1L
        (k, i.toLong)
      }.toDF("k", "payload").repartition(8)
      val hot = Skew.detectHotKeys(big, Seq("k"), sampleFraction = 1.0,
        hotRowThreshold = math.max(1L, n / 20L))
      assert(hot.map(_.getLong(0)).toSeq === Seq(0L),
        s"at n=$n detection must isolate exactly the hot key (cold path non-empty)")
    }
  }

  test("saltedJoin spreads a hot key of IDENTICAL duplicate rows") {
    import spark.implicits._
    // the degenerate case: every hot row is byte-identical, so a
    // content-derived salt would collapse to ONE salt value and the
    // whole hot key would still ride a single reducer
    val big = Seq.fill(4000)((1L, 7L)).toDF("k", "payload").repartition(8)
    val dim = Seq((1L, "a")).toDF("k", "attr")
    val out = Skew.saltedJoin(big, dim, Seq("k"), salts = 8)
    assert(out.count() === 4000L)
    // measure the spread with the operator's own salt recipe on the
    // same partitioning
    val spread = big.withColumn("__salt",
        pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(spread > 1, "identical duplicate hot rows must still spread across salts")
  }
}
