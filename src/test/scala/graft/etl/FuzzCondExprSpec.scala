package graft.etl

import org.apache.spark.sql.types._
import graft.SparkTestBase

class FuzzCondExprSpec extends SparkTestBase {

  /** Must mirror SparkEntry.fuzzCondExprBase / the DuckDB base subquery. */
  private val fuzzSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("price", DoubleType),
    StructField("status", StringType),
    StructField("prio", StringType),
    StructField("nk", LongType),
    StructField("ns", StringType),
    StructField("b", BooleanType),
    StructField("d", TimestampType)))

  test("battery is deterministic: two generations are identical") {
    // queries and oracleSql regenerate the battery independently; they
    // must agree case-for-case or the differential check compares
    // different expressions
    val a = FuzzCondExpr.cases(1000, 0xC0FFEEL)
    val b = FuzzCondExpr.cases(1000, 0xC0FFEEL)
    assert(a === b)
    assert(a.map(_.id).distinct.length === 1000)
  }

  test("every generated expression translates against the fuzz schema") {
    val bad = FuzzCondExpr.cases(1000, 0xC0FFEEL).flatMap { c =>
      CondExpr.translate(c.expr, fuzzSchema) match {
        case Right(_) => None
        case Left(msg) => Some(s"${c.id}: $msg in ${c.expr}")
      }
    }
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("full battery evaluates with no runtime error (ANSI overflow guard)") {
    // the generator bounds integer * chains so ANSI Spark (and DuckDB)
    // cannot overflow; one end-to-end run over the fixture proves it
    val out = graft.SparkEntry.queries("fuzz_condexpr")(spark, sf())
    assert(out.count() === 1000L)
  }

  test("a fresh seed still translates everywhere (grammar closure)") {
    val bad = FuzzCondExpr.cases(300, 12345L).flatMap { c =>
      CondExpr.translate(c.expr, fuzzSchema) match {
        case Right(_) => None
        case Left(msg) => Some(s"${c.id}: $msg in ${c.expr}")
      }
    }
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }
}
