package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuarantineSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, "42", "1.5"),   // clean
    (2L, "4x2", "1.5"),  // s fails bigint
    (3L, "7", "abc"),    // d fails double
    (4L, "x", "y"),      // both fail
    (5L, null, "2.0")    // NULL is not a cast failure
  ).toDF("id", "s", "d")

  private val specs = Seq("s" -> "bigint", "d" -> "double")

  test("clean stream applies the declared casts; NULLs pass through") {
    val c = Quarantine.clean(df, specs)
    assert(c.schema("s").dataType.typeName === "long")
    assert(c.schema("d").dataType.typeName === "double")
    val rows = c.collect().map(r => r.getLong(0)).sorted
    assert(rows.toSeq === Seq(1L, 5L))
  }

  test("quarantine stream carries one reason per failing column") {
    val q = Quarantine.quarantined(df, specs)
      .select($"id", $"quarantine_reasons")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(q === Map(
      2L -> Set("s!bigint"),
      3L -> Set("d!double"),
      4L -> Set("s!bigint", "d!double")))
  }

  test("clean + quarantined partition the input exactly") {
    val n = Quarantine.clean(df, specs).count() +
      Quarantine.quarantined(df, specs).count()
    assert(n === df.count())
  }
}
