package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class SchemaDriftSpec extends SparkTestBase {
  import spark.implicits._

  test("widening lattice: promotions, string fallback, rejections") {
    assert(SchemaDrift.widen(IntegerType, LongType) === Some(LongType))
    assert(SchemaDrift.widen(LongType, IntegerType) === Some(LongType))
    assert(SchemaDrift.widen(IntegerType, DoubleType) === Some(DoubleType))
    assert(SchemaDrift.widen(LongType, StringType) === Some(StringType))
    assert(SchemaDrift.widen(DoubleType, StringType) === Some(StringType))
    assert(SchemaDrift.widen(DateType, TimestampType) === Some(TimestampType))
    assert(SchemaDrift.widen(DecimalType(10, 2), DecimalType(12, 4)) ===
      Some(DecimalType(12, 4)))
    assert(SchemaDrift.widen(DecimalType(10, 2), LongType) === Some(DecimalType(22, 2)))
    assert(SchemaDrift.widen(DecimalType(10, 2), DoubleType) === Some(DoubleType))
    assert(SchemaDrift.widen(ArrayType(LongType), ArrayType(IntegerType)) === None)
    assert(SchemaDrift.widen(BooleanType, LongType) === None)
    // regression: string vs decimal used to ping-pong between the two
    // flip-argument cases and recurse forever
    assert(SchemaDrift.widen(StringType, DecimalType(12, 2)) === Some(StringType))
    assert(SchemaDrift.widen(DecimalType(12, 2), StringType) === Some(StringType))
    assert(SchemaDrift.widen(StringType, ArrayType(LongType)) === None)
  }

  test("decimal widening past 38 combined digits fails loud, never lossy") {
    // decimal(38,0) ∨ decimal(10,10) has no exact LUB: keeping scale 10
    // under the 38-digit cap would leave only 28 integral digits, so a
    // 38-digit integer would cast to NULL silently. Contract: None.
    assert(SchemaDrift.widen(DecimalType(38, 0), DecimalType(10, 10)) === None)
    assert(SchemaDrift.widen(DecimalType(10, 10), DecimalType(38, 0)) === None)
    // decimal with huge scale ∨ integral (needs 20 int digits): same cliff
    assert(SchemaDrift.widen(DecimalType(38, 19), LongType) === None)
    // exactly-38 combined digits still widens
    assert(SchemaDrift.widen(DecimalType(28, 0), DecimalType(10, 10)) ===
      Some(DecimalType(38, 10)))
    // and reconcileUnion surfaces the failure loudly
    val a = spark.range(1).select(col("id").cast(DecimalType(38, 0)).as("x"))
    val b = spark.range(1).select(col("id").cast(DecimalType(10, 10)).as("x"))
    val e = intercept[IllegalArgumentException] { SchemaDrift.reconcileUnion(Seq(a, b)) }
    assert(e.getMessage.contains("cannot reconcile"))
  }

  test("reconcileUnion aligns columns, widens types, back-fills NULL") {
    val a = Seq((1, "x")).toDF("k", "s") // int k
    val b = Seq((2L, 3.5)).toDF("k", "v") // long k, new v, no s
    val out = SchemaDrift.reconcileUnion(Seq(a, b))
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      Seq(("k", LongType), ("s", StringType), ("v", DoubleType)))
    val rows = out.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.toSeq === Seq((1L, Some("x"), None), (2L, None, Some(3.5))))
  }

  test("irreconcilable drift fails loud") {
    val a = Seq((1, true)).toDF("k", "flag")
    val b = Seq((2, 9L)).toDF("k", "flag")
    val e = intercept[IllegalArgumentException] {
      SchemaDrift.reconcileUnion(Seq(a, b))
    }
    assert(e.getMessage.contains("flag"))
  }

  test("column order is first appearance across batches") {
    val a = Seq((1, 2)).toDF("x", "y")
    val b = Seq((3, 4)).toDF("z", "x")
    assert(SchemaDrift.reconcileUnion(Seq(a, b)).columns.toSeq === Seq("x", "y", "z"))
  }
}
