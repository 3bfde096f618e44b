package graft.etl

import graft.SparkTestBase

class RuleCompilerSpec extends SparkTestBase {

  private def mainDf = {
    import spark.implicits._
    Seq((1L, 1200.0, "open", 10), (2L, 800.0, "closed", 20), (3L, 50.0, "open", 99))
      .toDF("id", "amount", "state", "code")
  }

  private def mapDf = {
    import spark.implicits._
    // duplicate key 10: last occurrence ("ten-v2") must win (main.py:168)
    Seq((10, "ten-v1"), (20, "twenty"), (10, "ten-v2")).toDF("k", "v")
  }

  test("direct map renames and projects only rule columns") {
    val r = RuleCompiler.run(mainDf, Seq(DirectMap("the_id", "id")), Map.empty)
    assert(r.errors.isEmpty)
    assert(r.output.columns.toSeq === Seq("the_id"))
    assert(r.output.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("conditional emits then/else strings") {
    val r = RuleCompiler.run(mainDf,
      Seq(DirectMap("id", "id"), Conditional("tier", "(`amount` > 1000)", "VIP", "Regular")),
      Map.empty)
    val got = r.output.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got === Map(1L -> "VIP", 2L -> "Regular", 3L -> "Regular"))
  }

  test("lookup: last-wins duplicates, miss -> null, string-coerced keys") {
    val r = RuleCompiler.run(mainDf,
      Seq(DirectMap("id", "id"), Lookup("label", "m", "code", "k", "v")),
      Map("m" -> mapDf))
    assert(r.errors.isEmpty)
    val got = r.output.collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(got === Map(1L -> Some("ten-v2"), 2L -> Some("twenty"), 3L -> None))
  }

  test("lookup join never multiplies rows") {
    val r = RuleCompiler.run(mainDf,
      Seq(Lookup("label", "m", "code", "k", "v")), Map("m" -> mapDf))
    assert(r.output.count() === 3)
  }

  test("missing mapping table: warning recorded, column not produced") {
    val r = RuleCompiler.run(mainDf,
      Seq(DirectMap("id", "id"), Lookup("label", "nope", "code", "k", "v")), Map.empty)
    assert(r.output.columns.toSeq === Seq("id"))
    assert(r.errors.exists(_.message.contains("'nope' not found")))
  }

  test("failed rule is skipped; remaining rules still run (main.py:173-174)") {
    val r = RuleCompiler.run(mainDf, Seq(
      DirectMap("a", "id"),
      Conditional("bad", "(`amount` >>> 1)", "x", "y"),
      DirectMap("nope", "no_such_col"),
      DirectMap("b", "state")), Map.empty)
    assert(r.output.columns.toSeq === Seq("a", "b"))
    assert(r.errors.size === 2)
  }

  test("empty input: zero rows, rule columns present") {
    val empty = mainDf.limit(0)
    val r = RuleCompiler.run(empty,
      Seq(DirectMap("id", "id"), Conditional("t", "(`amount` > 1)", "y", "n")), Map.empty)
    assert(r.output.columns.toSeq === Seq("id", "t"))
    assert(r.output.count() === 0)
  }

  test("duplicate output name: last rule wins, position of first occurrence kept") {
    val r = RuleCompiler.run(mainDf, Seq(
      DirectMap("x", "id"), DirectMap("y", "state"), DirectMap("x", "amount")), Map.empty)
    assert(r.output.columns.toSeq === Seq("x", "y"))
    val first = r.output.orderBy("y").collect().head
    assert(first.schema("x").dataType.typeName === "double")
  }

  test("pandasNanCoercion: null probe matches a null ('nan') mapping key") {
    import spark.implicits._
    val main = Seq[(java.lang.Long, java.lang.Double)]((1L, 10.0), (2L, null))
      .toDF("id", "code")
    val mapping = Seq[(java.lang.Double, String)]((10.0, "ten"), (null, "was-nan"))
      .toDF("k", "v")
    // default: Spark-natural, null never matches
    val plain = RuleCompiler.run(main, Seq(DirectMap("id", "id"),
      Lookup("label", "m", "code", "k", "v")), Map("m" -> mapping))
      .output.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(plain === Map(1L -> Some("ten"), 2L -> None))
    // parity mode: pandas astype(str) renders NaN as "nan" on both sides
    val parity = RuleCompiler.run(main, Seq(DirectMap("id", "id"),
      Lookup("label", "m", "code", "k", "v")), Map("m" -> mapping),
      pandasNanCoercion = true)
      .output.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(parity === Map(1L -> Some("ten"), 2L -> Some("was-nan")))
  }

  test("two lookups against different mappings compose") {
    import spark.implicits._
    val m2 = Seq(("open", "O"), ("closed", "C")).toDF("s", "abbr")
    val r = RuleCompiler.run(mainDf, Seq(
      Lookup("label", "m", "code", "k", "v"),
      Lookup("st", "m2", "state", "s", "abbr")),
      Map("m" -> mapDf, "m2" -> m2))
    assert(r.errors.isEmpty)
    val got = r.output.collect().map(x => (Option(x.getString(0)), x.getString(1))).toSet
    assert(got === Set((Some("ten-v2"), "O"), (Some("twenty"), "C"), (None, "O")))
  }

  test("probe side of the pipeline stays shuffle-free (broadcast lookups)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val r = RuleCompiler.run(mainDf, Seq(
      DirectMap("id", "id"),
      Conditional("t", "(`amount` > 100)", "y", "n"),
      Lookup("label", "m", "code", "k", "v")), Map("m" -> mapDf))
    val outer = r.output.queryExecution.executedPlan
    val plan = outer.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(outer)
    val joins = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, s"expected broadcast join in:\n$plan")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
    // The fact-table (streamed) side must carry no shuffle; the only
    // exchanges allowed are on the dimension side feeding the broadcast
    // (the last-wins dedup groupBy over the tiny mapping).
    joins.foreach { j =>
      val streamedShuffles = j.left.collect { case s: ShuffleExchangeExec => s }
      assert(streamedShuffles.isEmpty, s"shuffle on probe side:\n$plan")
    }
  }

  test("broadcastLookups=false drops the forced hint (scaling-mapping path)") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val r = RuleCompiler.run(mainDf, Seq(
      DirectMap("id", "id"),
      Lookup("label", "m", "code", "k", "v")), Map("m" -> mapDf),
      broadcastLookups = false)
    assert(r.errors.isEmpty)
    val hinted = r.output.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.flatMap(_.strategy).contains(BROADCAST) ||
        j.hint.rightHint.flatMap(_.strategy).contains(BROADCAST) => j
    }
    assert(hinted.isEmpty, "forced broadcast hint survived with broadcastLookups=false")
    assert(r.output.count() === mainDf.count()) // left join keeps all rows
  }
}
