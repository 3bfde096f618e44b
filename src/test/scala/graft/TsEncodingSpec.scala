package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture's `ts` column has shipped in two encodings across
  * driver drops: TIMESTAMP(NANOS) — which Spark reads as a nanosecond
  * LONG under spark.sql.legacy.parquet.nanosAsLong — and native micros
  * timestamp. Every event-time consumer in the contract must produce
  * IDENTICAL results over both. This spec stages the same synthetic
  * event tape in both encodings and runs the ts-sensitive contract
  * queries over each, asserting row-for-row equality. */
class TsEncodingSpec extends SparkTestBase {

  import spark.implicits._

  // Deterministic tape: 400 events, 20 users, 4 types, sub-second nano
  // components exercising the truncation paths (xxxx567891 ns).
  private lazy val (dirNano, dirMicro): (String, String) = {
    val rows = (0 until 400).map { i =>
      val sec = 1700000000L + (i % 97) * 613L + (i / 97) * 7L
      val nanos = sec * 1000000000L + (i % 10) * 100000000L + 567891L
      val etype = Seq("click", "view", "error", "purchase")(i % 4)
      (i.toLong, nanos, (i % 20).toLong, etype, (i % 13) * 1.5, s"""{"k":"$i"}""")
    }
    val base = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // The driver fixture ships events.parquet as a single FILE (the
    // streaming rows glob on that name), so stage each encoding as one:
    // write a directory, then move the lone part file into place.
    def stageSingleFile(df: org.apache.spark.sql.DataFrame, prefix: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(prefix)
      val tmp = java.nio.file.Files.createTempDirectory(s"${prefix}stage_")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, dir.resolve("events.parquet"))
      dir.toString
    }
    // nano encoding: ts stays a raw nanosecond long (what nanosAsLong yields)
    val nanoDir = stageSingleFile(base, "ts_nano_")
    // micro encoding: native timestamp column (truncates nanos -> micros,
    // exactly like the driver's micros writer)
    val microDir = stageSingleFile(
      base.withColumn("ts", timestamp_micros(call_function("div", col("ts"), lit(1000L)))),
      "ts_micro_")
    (nanoDir, microDir)
  }

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  private def assertSameResult(name: String): Unit = {
    val a = run(name, dirNano)
    val b = run(name, dirMicro)
    assert(a.schema.map(f => (f.name, f.dataType)) ===
      b.schema.map(f => (f.name, f.dataType)), s"$name: schema diverged")
    val cols = a.columns.map(col).toSeq
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$name: results diverged between nano-long and micros-timestamp encodings")
    assert(a.count() > 0, s"$name: vacuous (0 rows) — tape too small")
    val _ = cols
  }

  test("as-of joins are encoding-invariant") {
    assertSameResult("q_asof_join")
    assertSameResult("q_asof_join_forward")
    assertSameResult("q_asof_join_nullpick")
  }

  test("range join is encoding-invariant") {
    assertSameResult("q_range_join")
  }

  test("event-time batch analytics are encoding-invariant") {
    assertSameResult("events_tumbling")
    assertSameResult("events_sessionize")
  }

  test("streaming tumbling replay is encoding-invariant") {
    assertSameResult("stream_tumbling")
  }

  test("the micros staging truncates exactly to whole micros") {
    val read = spark.read.parquet(s"$dirMicro/events.parquet")
    val t = read.schema("ts").dataType
    assert(t == TimestampType || t == TimestampNTZType, s"got $t")
    // every second-truncated value matches the nano tape's div-based one
    val nano = spark.read.parquet(s"$dirNano/events.parquet")
      .select(col("event_id"),
        call_function("div", col("ts"), lit(1000000000L)).as("sec"))
    val micro = read.select(col("event_id"), unix_timestamp(col("ts")).as("sec"))
    assert(nano.exceptAll(micro).isEmpty && micro.exceptAll(nano).isEmpty)
  }
}
