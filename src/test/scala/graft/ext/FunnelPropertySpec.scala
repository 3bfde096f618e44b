package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized adversary for funnel analysis: event tapes with heavy
  * timestamp ties (the strict after-previous-step boundary), steps
  * occurring before their predecessors, repeats, and absent steps, all
  * compared to a greedy earliest-completion brute force per user. */
class FunnelPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("funnel == greedy brute force over 15 tie-heavy tapes") {
    val steps = Seq("view", "cart", "buy")
    (0 until 15).foreach { scenario =>
      val rnd = new scala.util.Random(scenario)
      val types = Vector("view", "cart", "buy", "noise")
      // tiny ts domain: many exact ties within and across steps
      val events = (0 until 150).map { i =>
        (i.toLong, rnd.nextInt(12).toLong * 1000000000L, rnd.nextInt(6).toLong,
          types(rnd.nextInt(types.length)), 1.0)
      }
      val df = events.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", timestamp_seconds(col("ts") / 1000000000L))
      val got = Events.funnel(df, steps).collect().map { r =>
        r.getLong(0) -> (((1 to steps.size).map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))), r.getInt(steps.size + 1)))
      }.toMap
      val brute = events.groupBy(_._3).map { case (user, evs) =>
        val byType = evs.groupBy(_._4).map { case (t, es) =>
          t -> es.map(_._2 / 1000000000L).sorted
        }
        var prev = Option.empty[Long]
        val hits = steps.zipWithIndex.map { case (s, i) =>
          val cand = byType.getOrElse(s, Nil)
            .filter(t => if (i == 0) true else prev.exists(t > _))
          val hit = if (i > 0 && prev.isEmpty) None else cand.headOption
          prev = if (i == 0) cand.headOption else hit
          if (i == 0) cand.headOption else hit
        }
        user -> ((hits, hits.count(_.isDefined)))
      }
      got.foreach { case (u, (ts, reached)) =>
        val (bts, breached) = brute(u)
        assert(ts === bts, s"scenario $scenario user $u: $ts vs $bts")
        assert(reached === breached, s"scenario $scenario user $u reached")
      }
      assert(got.keySet === brute.keySet)
    }
  }
}
