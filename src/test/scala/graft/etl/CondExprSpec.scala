package graft.etl

import graft.SparkTestBase

class CondExprSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def evalOn(expression: String, rows: Seq[(java.lang.Double, String)]): Seq[Boolean] = {
    import spark.implicits._
    val df = rows.toDF("Amount", "Status")
    val c = CondExpr.translate(expression).fold(m => fail(s"parse failed: $m"), identity)
    // null predicate -> false via the same when/otherwise shape the compiler uses
    df.select(when(c, lit(true)).otherwise(lit(false)).as("r")).collect().map(_.getBoolean(0)).toSeq
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

  test("parse errors are reported, not thrown") {
    assert(CondExpr.translate("").isLeft)
    assert(CondExpr.translate("(`Amount` > 500").isLeft)
    assert(CondExpr.translate("`Amount > 500)").isLeft)
    assert(CondExpr.translate("`Amount` >> 5").isLeft)
    assert(CondExpr.translate("(`A` > 1) ? (`B` < 2)").isLeft)
    assert(CondExpr.translate("'lone literal'").isLeft)
  }

  test("string literals with double quotes and spaces in column names") {
    import spark.implicits._
    val df = Seq(("north region", 1)).toDF("sales region", "x")
    val c = CondExpr.translate("(`sales region` == \"north region\")")
      .fold(m => fail(m), identity)
    assert(df.select(when(c, lit(1)).otherwise(lit(0))).collect().head.getInt(0) === 1)
  }
}
