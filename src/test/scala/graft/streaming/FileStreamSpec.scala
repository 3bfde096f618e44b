package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Drive the streaming operators from a real file source: the events
  * fixture re-written with proper timestamps, consumed via readStream and
  * aggregated with a watermark. The fixture's ts has shipped both as
  * TIMESTAMP(NANOS)-read-as-long and as native micros timestamp across
  * driver drops — normalize either to TimestampType. */
class FileStreamSpec extends SparkTestBase {

  private def tsAsMicros(schema: org.apache.spark.sql.types.StructType) =
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      timestamp_micros(call_function("div", col("ts"), lit(1000L)))
    else col("ts").cast("timestamp")

  test("readStream over the events fixture feeds the tumbling aggregation") {
    val staged = java.nio.file.Files.createTempDirectory("evstream").toString
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    val batch = raw.withColumn("ts", tsAsMicros(raw.schema))
    batch.coalesce(1).write.mode("overwrite").parquet(staged)

    val stream = spark.readStream.schema(spark.read.parquet(staged).schema).parquet(staged)
    StreamingOps.runToMemory(
      StreamingOps.tumbling(stream, windowLen = "1 hour", watermark = "2 hours"),
      "file_tumb", OutputMode.Append())
    val streamed = spark.table("file_tumb")
      .agg(sum("n_events")).collect().head.getLong(0)
    // append mode emits exactly the watermark-closed windows: those with
    // window_end <= max(ts) - 2h once the stream drains
    val maxTs = batch.agg(max(unix_timestamp(col("ts")))).collect().head.getLong(0)
    val expected = batch
      .filter((floor(unix_timestamp(col("ts")) / 3600) + 1) * 3600 <= maxTs - 7200)
      .count()
    assert(streamed === expected, s"streamed=$streamed expectedClosed=$expected")
  }

  test("parquet sink with checkpoint is exactly-once across restarts") {
    val out = java.nio.file.Files.createTempDirectory("evsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evckpt").toString
    val batchDf = spark.read.parquet(s"${sf()}/events.parquet")
    def drainOnce(): Unit = {
      val stream = spark.readStream.schema(batchDf.schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf())
        .withColumn("ts", tsAsMicros(batchDf.schema))
      StreamingOps.runToParquet(
        StreamingOps.dedupStream(stream, keyCols = Seq("event_id")), out, ckpt)
    }
    drainOnce()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === batchDf.select("event_id").distinct().count())
    // "restart": same checkpoint, same input -> source offsets already
    // committed, NOTHING reprocessed, no duplicate rows in the sink
    drainOnce()
    assert(spark.read.parquet(out).count() === afterFirst)
  }

  test("tumblingEpoch over the raw fixture (complete mode) equals the batch aggregation") {
    val batchDf = spark.read.parquet(s"${sf()}/events.parquet")
    val stream = spark.readStream.schema(batchDf.schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf())
    StreamingOps.runToMemory(
      StreamingOps.tumblingEpoch(stream), "epoch_tumb", OutputMode.Complete())
    val streamed = spark.table("epoch_tumb")
      .orderBy("window_start", "event_type").collect()
    val batch = graft.ext.Events.tumbling(batchDf)
      .select("window_start", "event_type", "n_events", "sum_value")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length === batch.length)
    assert(streamed.sameElements(batch))
  }
}
