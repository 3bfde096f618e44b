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

  test("hopping windows: each event lands in exactly window/slide windows") {
    import spark.implicits._
    // event at t=3700 with L=3600, S=900: windows starting 900..3600
    val df = Seq((1L, 3700L * 1000000000L, "click", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = Events.hopping(df, windowSeconds = 3600, slideSeconds = 900)
      .orderBy("window_start").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(900L, 1800L, 2700L, 3600L))
    assert(out.forall(_.getLong(2) === 1L))
    // conservation: every event counted exactly L/S times
    val total = Events.hopping(events).agg(sum("n_events")).head.getLong(0)
    assert(total === events.count() * 4)
  }

  test("funnel: steps must be reached strictly in order") {
    import spark.implicits._
    // u1 completes view->click->purchase in order
    // u2 clicks BEFORE viewing: click must not count, reached = 1
    // u3 views only; u4 has click same-second as view: '>' excludes it
    // u5 never views: reached = 0 despite a purchase
    val df = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "click"), (2L, 200L, "view"),
      (3L, 100L, "view"),
      (4L, 100L, "view"), (4L, 100L, "click"),
      (5L, 100L, "purchase")
    ).map { case (u, t, e) => (u, t * 1000000000L, e) }
      .toDF("user_id", "ts", "event_type")
    val out = Events.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3), r.getInt(4))).toMap
    assert(out(1L) === ((100L, 200L, 300L, 3)))
    assert(out(2L) === ((200L, null, null, 1)))
    assert(out(3L) === ((100L, null, null, 1)))
    assert(out(4L) === ((100L, null, null, 1)))
    assert(out(5L) === ((null, null, null, 0)))
    // exactly one row per user
    assert(out.size === 5)
  }

  test("transitions: per-user next-event pairs, exact probabilities") {
    import spark.implicits._
    // u1: view->click->view->purchase; u2: view->view
    // last event per user emits no transition
    val df = Seq(
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"),
      (1L, 3L, 300L, "view"), (1L, 4L, 400L, "purchase"),
      (2L, 5L, 100L, "view"), (2L, 6L, 200L, "view")
    ).map { case (u, e, t, ty) => (u, e, t * 1000000000L, ty) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Events.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // from view: ->click (1), ->view (2: u1's view@300->purchase? no —
    // u1 view@300 -> purchase, u2 view@100 -> view@200), ->purchase (1)
    assert(out(("view", "click")) === ((1L, 3L, 1.0 / 3.0)))
    assert(out(("view", "view")) === ((1L, 3L, 1.0 / 3.0)))
    assert(out(("view", "purchase")) === ((1L, 3L, 1.0 / 3.0)))
    assert(out(("click", "view")) === ((1L, 1L, 1.0)))
    assert(out.size === 4) // no transition out of the final events
  }

  test("transitions: same-timestamp ties break by event_id") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 100L, "b"), (1L, 12L, 100L, "c")
    ).map { case (u, e, t, ty) => (u, e, t * 1000000000L, ty) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val pairs = Events.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("a", "b"), ("b", "c")))
  }

  test("cohortRetention builds the standard triangle from first activity") {
    import spark.implicits._
    // periods of 100s; nanos ts (long column). user 1: periods 0,1,3;
    // user 2: periods 1,2; user 3: period 0 only
    def ns(p: Long, off: Long = 0L) = (p * 100 + off) * 1000000000L
    val df = Seq(
      (1L, 10L, ns(0)), (1L, 11L, ns(1)), (1L, 12L, ns(3)), (1L, 13L, ns(3, 5)),
      (2L, 20L, ns(1)), (2L, 21L, ns(2)),
      (3L, 30L, ns(0))
    ).toDF("user_id", "event_id", "ts")
    val got = Events.cohortRetention(df, bucketSeconds = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (0L, 0L, 2L), // cohort 0 = users 1,3
      (0L, 1L, 1L), (0L, 3L, 1L), // user 1 returns in periods 1 and 3 (dup collapsed)
      (1L, 0L, 1L), (1L, 1L, 1L))) // cohort 1 = user 2
  }

  test("attribution credits first/last in-window touches; no-touch conversions omitted") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    val df = Seq(
      (1L, ns(100), 1L, "click", 0.0),   // first touch of conv 10
      (2L, ns(200), 1L, "view", 0.0),    // last touch of conv 10
      (3L, ns(300), 1L, "click", 0.0),   // AFTER conv 10: no credit
      (10L, ns(250), 1L, "purchase", 0.0),
      (11L, ns(90), 1L, "purchase", 0.0), // no touch at or before: omitted
      (5L, ns(500), 2L, "view", 0.0),    // same-second touch counts (<=)
      (12L, ns(500), 2L, "purchase", 0.0),
      (6L, ns(400), 3L, "error", 0.0))   // not a touch type
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.attribution(df, lookbackSeconds = 7200L)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[Long]("first_id"), r.getAs[String]("first_type"),
          r.getAs[Long]("last_id"), r.getAs[String]("last_type"),
          r.getAs[Long]("n_touches")))).toMap
    assert(got === Map(
      10L -> ((1L, "click", 2L, "view", 2L)),
      12L -> ((5L, "view", 5L, "view", 1L))))
  }

  test("multi-touch attribution: exact linear split and dyadic time decay") {
    import spark.implicits._
    def ns(sec: Long) = sec * 1000000000L
    // three touches for one purchase at t=4000: deltas 3900, 2000, 100
    // -> halflife buckets k = 2, 1, 0 at halflife 1800
    val df = Seq(
      (1L, ns(100), 1L, "click", 0.0),
      (2L, ns(2000), 1L, "view", 0.0),
      (3L, ns(3900), 1L, "click", 0.0),
      (10L, ns(4000), 1L, "purchase", 0.0),
      (4L, ns(9999), 2L, "view", 0.0))   // no conversion: no rows
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.attributionMultiTouch(df,
        lookbackSeconds = 7200L, halflifeSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("t_id") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("w_linear_micro"),
          r.getAs[Long]("w_decay_micro")))).toMap
    assert(got === Map(
      1L -> ((3L, 333333L, 250000L)),  // k=2 -> 1e6/4
      2L -> ((3L, 333333L, 500000L)),  // k=1 -> 1e6/2
      3L -> ((3L, 333333L, 1000000L)))) // k=0 -> full credit
  }

  test("funnelWithExclusion: errors only taint inside completed step pairs") {
    import spark.implicits._
    val df = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 250L, "error"),
      (1L, 300L, "purchase"), // error inside click->purchase: tainted
      (2L, 100L, "view"), (2L, 50L, "error"), (2L, 200L, "click"),
      (2L, 300L, "purchase"), (2L, 400L, "error"), // outside windows: clean
      (3L, 100L, "view"), (3L, 150L, "error"), (3L, 200L, "click"),
      (4L, 100L, "view")
    ).map { case (u, t, e) => (u, t * 1000000000L, e) }
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnelWithExclusion(df,
        Seq("view", "click", "purchase"), excluded = "error")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got(1L) === ((3, 1L, false)))
    assert(got(2L) === ((3, 0L, true)))
    assert(got(3L) === ((2, 1L, false))) // tainted view->click pair
    assert(got(4L) === ((1, 0L, false)))
  }

  test("coverage: islands merge overlaps, adjacency (half-open) merges, gaps exact") {
    import spark.implicits._
    // user 1, len 10: [0,10)+[5,15) merge; [15,25) is ADJACENT (st=15
    // not > prevMax=15) so it extends the island; [40,50) is its own
    // -> islands [0,25) and [40,50): covered 35, span 50, gap 15
    // user 2: one event -> covered == len, gap 0
    val df = Seq((1L, 0L), (1L, 5L), (1L, 15L), (1L, 40L), (2L, 100L))
      .map { case (u, sec) => (u, sec * 1000000000L) }
      .toDF("user_id", "ts")
    val got = Events.coverage(df, "user_id", lenSec = 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === ((4L, 2L, 35L, 50L, 15L)))
    assert(got(2L) === ((1L, 1L, 10L, 10L, 0L)))
  }

  test("coverage: duplicate timestamps cannot split an island") {
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 0L), (1L, 0L), (1L, 3L))
      .map { case (u, sec) => (u, sec * 1000000000L) }
      .toDF("user_id", "ts")
    val got = Events.coverage(df, "user_id", lenSec = 5L).head()
    assert(got.getLong(2) === 1L) // one island
    assert(got.getLong(3) === 8L) // [0, 8)
  }
}
