package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class CondExprSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def df(rows: Seq[(java.lang.Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("Amount", "Status")
  }

  private def evalOn(expression: String, rows: Seq[(java.lang.Double, String)]): Seq[Boolean] = {
    val d = df(rows)
    val c = CondExpr.translate(expression, d.schema).fold(m => fail(s"parse failed: $m"), identity)
    // null predicate -> false via the same when/otherwise shape the compiler uses
    d.select(when(c, lit(true)).otherwise(lit(false)).as("r")).collect().map(_.getBoolean(0)).toSeq
  }

  test("builder-emitted AND form: (`Amount` > 500) & (`Status` == 'Active')") {
    val got = evalOn("(`Amount` > 500) & (`Status` == 'Active')",
      Seq((600.0, "Active"), (600.0, "Idle"), (400.0, "Active"), (null, "Active")))
    assert(got === Seq(true, false, false, false))
  }

  test("OR form and != operator") {
    val got = evalOn("(`Amount` <= 100) | (`Status` != 'Active')",
      Seq((50.0, "Active"), (500.0, "Idle"), (500.0, "Active")))
    assert(got === Seq(true, true, false))
  }

  test("& binds tighter than |") {
    // a | b & c  ==  a | (b & c)
    val got = evalOn("(`Status` == 'X') | (`Amount` > 10) & (`Amount` < 20)",
      Seq((15.0, "A"), (25.0, "A"), (25.0, "X")))
    assert(got === Seq(true, false, true))
  }

  test("bare identifiers and numeric forms") {
    val got = evalOn("Amount >= 500.0", Seq((500.0, "a"), (499.0, "a")))
    assert(got === Seq(true, false))
  }

  test("null comparison falls to else (pandas NaN-compare-False parity)") {
    val got = evalOn("(`Amount` > 500)", Seq((null, "a")))
    assert(got === Seq(false))
  }

  test("cross-type equality is elementwise False/True, not an error (python semantics)") {
    assert(evalOn("(`Status` == 42)", Seq((1.0, "a"))) === Seq(false))
    assert(evalOn("(`Status` != 42)", Seq((1.0, "a"))) === Seq(true))
    assert(evalOn("(`Amount` == 'x')", Seq((1.0, "a"))) === Seq(false))
  }

  test("cross-type ordering is a TypeError -> rule error (python semantics)") {
    val schema = df(Seq((1.0, "a"))).schema
    assert(CondExpr.translate("(`Status` > 42)", schema).isLeft)
    assert(CondExpr.translate("(`Amount` < 'x')", schema).isLeft)
  }

  test("unknown column is a translate-time error") {
    val schema = df(Seq((1.0, "a"))).schema
    assert(CondExpr.translate("(`Nope` > 42)", schema).isLeft)
  }

  test("parse errors are reported, not thrown") {
    val schema = df(Seq((1.0, "a"))).schema
    assert(CondExpr.translate("", schema).isLeft)
    assert(CondExpr.translate("(`Amount` > 500", schema).isLeft)
    assert(CondExpr.translate("`Amount > 500)", schema).isLeft)
    assert(CondExpr.translate("`Amount` >> 5", schema).isLeft)
    assert(CondExpr.translate("(`A` > 1) ? (`B` < 2)", schema).isLeft)
    assert(CondExpr.translate("'lone literal'", schema).isLeft)
  }

  test("string literals with double quotes and spaces in column names") {
    import spark.implicits._
    val d = Seq(("north region", 1)).toDF("sales region", "x")
    val c = CondExpr.translate("(`sales region` == \"north region\")", d.schema)
      .fold(m => fail(m), identity)
    assert(d.select(when(c, lit(1)).otherwise(lit(0))).collect().head.getInt(0) === 1)
  }

  test("arithmetic in comparisons: products, sums, parenthesized groups") {
    val got = evalOn("(`Amount` * 2 + 10) > 110", Seq((51.0, "a"), (50.0, "a"), (49.0, "a")))
    assert(got === Seq(true, false, false))
    val got2 = evalOn("(`Amount` - 5) / 5 >= 9", Seq((50.0, "a"), (49.0, "a")))
    assert(got2 === Seq(true, false))
  }

  test("binary minus vs negative literal disambiguation") {
    assert(evalOn("`Amount` - 10 > -5", Seq((6.0, "a"), (4.0, "a"))) === Seq(true, false))
  }

  test("~ negation, including pandas NaN semantics (~False is True)") {
    assert(evalOn("~(`Amount` > 500)", Seq((600.0, "a"), (400.0, "a"))) === Seq(false, true))
    // NaN > 500 is False in pandas, so ~ gives True
    assert(evalOn("~(`Amount` > 500)", Seq((null, "a"))) === Seq(true))
    assert(evalOn("~(`Amount` > 500) & (`Status` == 'a')", Seq((null, "a"), (null, "b")))
      === Seq(true, false))
  }

  test("string concatenation with + (python semantics)") {
    assert(evalOn("(`Status` + '!') == 'Active!'", Seq((1.0, "Active"), (1.0, "Idle")))
      === Seq(true, false))
  }

  test("number + string is a TypeError") {
    val schema = df(Seq((1.0, "a"))).schema
    assert(CondExpr.translate("(`Amount` + `Status`) > 1", schema).isLeft)
  }

  test("timestamp column compares against a date-string literal") {
    import spark.implicits._
    val d = Seq(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("1999-06-01 00:00:00")).toDF("ts")
    val c = CondExpr.translate("(`ts` > '1998-12-31')", d.schema).fold(m => fail(m), identity)
    assert(d.select(when(c, lit(true)).otherwise(lit(false))).collect()
      .map(_.getBoolean(0)).toSeq === Seq(false, true))
  }

  test("boolean column compares numerically (python bools are ints)") {
    import spark.implicits._
    val d = Seq(true, false).toDF("flag")
    val c = CondExpr.translate("(`flag` > 0.5)", d.schema).fold(m => fail(m), identity)
    assert(d.select(when(c, lit(true)).otherwise(lit(false))).collect()
      .map(_.getBoolean(0)).toSeq === Seq(true, false))
  }
}
