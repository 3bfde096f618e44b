package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  test("backward as-of picks greatest right ts <= left ts, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"), (2L, 100L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 80L, 10.0), (1L, 150L, 20.0), (2L, 500L, 30.0))
      .toDF("k", "ts", "price")
    val got = AsOfJoin.backward(left, right, keys = Seq("k"), tsCol = "ts",
      pick = Seq("price")).collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[Any]("price_asof"))).toMap
    assert(got === Map(
      "l0" -> None, // before any right row
      "l1" -> Some(10.0), // 80 <= 100 < 150
      "l2" -> Some(20.0), // 150 <= 200
      "l3" -> None)) // right row at 500 is after 100
  }

  test("equal timestamps match (<= semantics) and ties break by max tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 7L, "first"), (1L, 100L, 9L, "second"))
      .toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("v"),
      tiebreakCol = Some("rid")).collect().head
    assert(got.getAs[String]("v_asof") === "second")
  }

  test("randomized: agrees with a brute-force reference, NULL picks included") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // random left/right rows over few keys + coarse timestamps to force
    // collisions, with ~30% NULL pick values — the case a fixture oracle
    // cannot cover (the advisor's stale-carry scenario)
    val left = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 10, i.toLong)
    }
    val right = (1 to 200).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 10, i.toLong,
        if (rnd.nextInt(10) < 3) null else s"p$i",
        if (rnd.nextInt(10) < 3) null else s"q$i")
    }
    val leftDf = left.toDF("k", "ts", "lid")
    val rightDf = right.toDF("k", "ts", "rid", "pa", "pb")
    val got = AsOfJoin.backward(leftDf, rightDf, keys = Seq("k"), tsCol = "ts",
      pick = Seq("pa", "pb"), tiebreakCol = Some("rid")).collect()
      .map(r => r.getAs[Long]("lid") ->
        ((Option(r.getAs[String]("pa_asof")), Option(r.getAs[String]("pb_asof")))))
      .toMap
    // brute force: per left row, the matched right row is max (ts, rid)
    // among right rows with same key and ts <= left ts; BOTH picks come
    // from that single row (nulls included)
    val expected = left.map { case (k, ts, lid) =>
      val m = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption
      lid -> ((m.flatMap(r => Option(r._4)), m.flatMap(r => Option(r._5))))
    }.toMap
    assert(got.size === expected.size)
    expected.foreach { case (lid, exp) =>
      assert(got(lid) === exp, s"left row $lid")
    }
  }

  test("forward as-of picks smallest right ts >= left ts, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"), (2L, 600L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 80L, 10.0), (1L, 150L, 20.0), (2L, 500L, 30.0))
      .toDF("k", "ts", "price")
    val got = AsOfJoin.forward(left, right, keys = Seq("k"), tsCol = "ts",
      pick = Seq("price")).collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[Any]("price_asof"))).toMap
    assert(got === Map(
      "l0" -> Some(10.0), // 50 <= 80
      "l1" -> Some(20.0), // next right at-or-after 100 is 150
      "l2" -> None, // nothing at-or-after 200
      "l3" -> None)) // right row at 500 is before 600
  }

  test("forward randomized: agrees with a brute-force reference, ties to min tiebreak") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 10, i.toLong)
    }
    val right = (1 to 200).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 10, i.toLong,
        if (rnd.nextInt(10) < 3) null else s"p$i")
    }
    val got = AsOfJoin.forward(left.toDF("k", "ts", "lid"),
      right.toDF("k", "ts", "rid", "pa"),
      keys = Seq("k"), tsCol = "ts", pick = Seq("pa"), tiebreakCol = Some("rid"))
      .collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[String]("pa_asof"))).toMap
    // brute force: min (ts, rid) among right rows with ts >= left ts
    val expected = left.map { case (k, ts, lid) =>
      val m = right.filter(r => r._1 == k && r._2 >= ts)
        .sortBy(r => (r._2, r._3)).headOption
      lid -> m.flatMap(r => Option(r._4))
    }.toMap
    expected.foreach { case (lid, exp) => assert(got(lid) === exp, s"left row $lid") }
  }

  test("matched row's NULL fields stay NULL — no stale carry from older rows") {
    import spark.implicits._
    val left = Seq((1L, 200L, "l")).toDF("k", "ts", "tag")
    // older right row has non-null price; the actually-matched (most
    // recent) right row has a NULL price but non-null qty: ASOF semantics
    // require BOTH picked values to come from the matched row
    val right = Seq(
      (1L, 100L, Some(10.0), Some(5L)),
      (1L, 150L, None: Option[Double], Some(9L)))
      .toDF("k", "ts", "price", "qty")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts",
      pick = Seq("price", "qty")).collect().head
    assert(got.isNullAt(got.fieldIndex("price_asof")),
      "stale price carried from an older right row")
    assert(got.getAs[Long]("qty_asof") === 9L)
  }

  test("one shuffle only: plan has a single hashpartitioning exchange") {
    import spark.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, 80L, 1.0)).toDF("k", "ts", "v")
    Seq(
      AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("v")),
      AsOfJoin.forward(left, right, Seq("k"), "ts", Seq("v"))).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 1, s"expected exactly 1 shuffle:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    }
  }
}
