package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.ArrayType
import graft.SparkTestBase

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every build key passes mightContain") {
    val build = (1L to 2000L).map(_ * 7919L).toDF("k")
    val h = BloomJoin.buildBits(build, "k", fpp = 0.01)
    val missed = build.filter(!BloomJoin.mightContain(h, col("k"))).count()
    assert(missed === 0L)
  }

  test("false positive rate is near the configured fpp") {
    val build = (1L to 5000L).toDF("k")
    val h = BloomJoin.buildBits(build, "k", fpp = 0.01)
    // probe keys disjoint from the build set
    val probe = (1000001L to 1050000L).toDF("k")
    val fp = probe.filter(BloomJoin.mightContain(h, col("k"))).count()
    assert(fp < 50000 * 0.05, s"false positive count $fp way above fpp budget")
  }

  test("semiJoin result is identical to the plain semi join") {
    val probe = (1L to 20000L).map(i => (i, i % 97)).toDF("pk", "payload")
    val build = (1L to 20000L).filter(_ % 13 == 0).map(i => i).toDF("bk")
    val got = BloomJoin.semiJoin(probe, build, "pk", "bk")
      .orderBy("pk").collect().map(_.getLong(0))
    val want = probe.join(build, col("pk") === col("bk"), "left_semi")
      .orderBy("pk").collect().map(_.getLong(0))
    assert(got.toSeq === want.toSeq)
  }

  test("bloom filter sits on the probe side below the join, with no plan literal") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // parquet scans, not LocalRelations: ConvertToLocalRelation folds a
      // Filter over in-memory data away at optimize time, which would hide
      // the bloom test from the plan string
      val probe = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select(col("l_orderkey").as("pk"))
      val build = spark.read.parquet(s"${sf()}/orders.parquet")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("bk"))
      val joined = BloomJoin.semiJoin(probe, build, "pk", "bk")
      joined.collect()
      val exec = joined.queryExecution.executedPlan
      val plan = exec.toString
      // membership test present, and the join is a shuffle join whose probe
      // branch filters before the exchange: the bloom filter line must
      // appear in the plan, and the result must stay exact regardless.
      assert(plan.contains("bloom_might_contain"), s"no bloom membership test in plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join with broadcast disabled:\n$plan")
      // the bloom Filter must be below the join: in the string rendering the
      // bloom_might_contain filter line is indented under the probe-side
      // subtree, i.e. it appears after the join operator line
      val joinLine = plan.linesIterator.indexWhere(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      val filterLine = plan.linesIterator.indexWhere(_.contains("bloom_might_contain"))
      assert(filterLine > joinLine, "bloom filter should be inside a join subtree")
      // the word array must travel as a broadcast variable, NOT as a plan
      // literal: no array literal of any size may appear anywhere in the
      // executed plan's expressions (a 1M-bit filter as typedLit would be
      // a 128 KiB literal riding every serialized task)
      val arrayLiterals = exec.collect { case p => p }.flatMap(_.expressions)
        .flatMap(_.collect { case l @ Literal(_, _: ArrayType) => l })
      assert(arrayLiterals.isEmpty,
        s"bloom word array leaked into the plan as a literal: $arrayLiterals")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom pre-filter thins the probe side to matches + fpp budget") {
    val probe = (1L to 100000L).toDF("pk")
    val build = (1L to 100000L).filter(_ % 100 == 0).toDF("bk") // 1% match
    val h = BloomJoin.buildBits(build, "bk", fpp = 0.01)
    val passed = probe.filter(BloomJoin.mightContain(h, col("pk"))).count()
    val matches = 1000L
    assert(passed >= matches)
    assert(passed <= matches + (100000L * 0.05).toLong,
      s"bloom passed $passed rows for $matches true matches")
  }

  test("sizing uses a single approx_count_distinct action and stays exact") {
    // heavily duplicated build keys: approx distinct sizing must size on
    // ~distinct count (500), not row count (50k) — and the join stays exact
    val build = (1L to 50000L).map(i => i % 500).toDF("bk")
    val probe = (1L to 5000L).toDF("pk")
    val h = BloomJoin.buildBits(build, "bk", fpp = 0.01)
    assert(h.mBits < 64 * 1024, s"sizing ignored duplication: mBits=${h.mBits}")
    val got = BloomJoin.semiJoin(probe, build, "pk", "bk")
      .select("pk").distinct().count()
    assert(got === 499L) // keys 1..499 present (i%500 for i in 1..50000 covers 0..499; pk>=1)
  }

  test("mixed key types: INT probe vs BIGINT build (and vice versa) matches the equality join") {
    // xxhash64 is type-sensitive: without the probe-side cast to the
    // build key's type, an INT probe never hits a BIGINT build key's
    // bits even for equal values, and the bloom pre-filter silently
    // drops rows the equality join would have matched.
    val probeInt = (1 to 5000).map(i => i).toDF("pk")
      .select(col("pk").cast("int").as("pk"))
    val buildLong = (1L to 5000L).filter(_ % 11 == 0).toDF("bk") // BIGINT
    val got1 = BloomJoin.semiJoin(probeInt, buildLong, "pk", "bk")
      .orderBy("pk").collect().map(_.getInt(0)).toSeq
    val want1 = probeInt.join(buildLong, col("pk") === col("bk"), "left_semi")
      .orderBy("pk").collect().map(_.getInt(0)).toSeq
    assert(got1.nonEmpty && got1 === want1)

    // reverse direction: BIGINT probe, INT build — includes a probe value
    // beyond Int range, which TRY-cast nulls out (it cannot match) rather
    // than throwing under ANSI
    val probeLong = ((1L to 5000L) :+ (Int.MaxValue.toLong + 7L)).toDF("pk")
    val buildInt = (1 to 5000).filter(_ % 13 == 0).map(i => i).toDF("bk")
      .select(col("bk").cast("int").as("bk"))
    val got2 = BloomJoin.semiJoin(probeLong, buildInt, "pk", "bk")
      .orderBy("pk").collect().map(_.getLong(0)).toSeq
    val want2 = probeLong.join(buildInt, col("pk") === col("bk"), "left_semi")
      .orderBy("pk").collect().map(_.getLong(0)).toSeq
    assert(got2.nonEmpty && got2 === want2)
  }
}
