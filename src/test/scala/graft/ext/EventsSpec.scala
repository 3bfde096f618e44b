package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EventsSpec extends SparkTestBase {

  private lazy val events = spark.read.parquet(s"${sf()}/events.parquet")

  test("withProps parses all keys in one from_json pass") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Events.withProps(events, schema)
    val ks = df.select(col("props_struct.k")).na.drop().count()
    assert(ks === events.count()) // every props has a k
    // agrees with the string-path extraction
    val viaGet = Events.withProp(events, "k", "k_str")
      .select(col("event_id"), col("k_str").cast("long").as("k"))
    val viaStruct = df.select(col("event_id"), col("props_struct.k").as("k"))
    assert(viaGet.exceptAll(viaStruct).count() === 0)
  }

  test("tumbling window totals cover every event exactly once") {
    val agg = Events.tumbling(events)
    val total = agg.agg(sum("n_events")).collect().head.getLong(0)
    assert(total === events.count())
  }

  test("sessionize: session bounds ordered, counts conserve") {
    val s = Events.sessionize(events)
    assert(s.filter(col("session_end") < col("session_start")).count() === 0)
    assert(s.agg(sum("n_events")).collect().head.getLong(0) === events.count())
  }
}
