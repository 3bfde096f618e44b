package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins UrlOps canonicalization rules and AsOfJoin.nearest picks. */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalUrl(col("url"))).collect()
      .map(_.getString(0)).toSeq

  test("scheme/host lowercase + www strip, path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path/To") ===
      Seq("https://example.com/Path/To"))
  }

  test("fragment drops; trailing slashes collapse; empty path -> /") {
    assert(canon(
      "https://a.com/p/1/#section",
      "https://a.com/p/1///",
      "https://a.com",
      "https://a.com/#top") === Seq(
      // empty path normalizes to "/" (RFC 3986 §6.2.3), so the bare
      // and slash-only forms merge
      "https://a.com/p/1", "https://a.com/p/1", "https://a.com/", "https://a.com/"))
  }

  test("utm params drop in every position; other params keep order") {
    assert(canon(
      "https://a.com/p?utm_source=x",
      "https://a.com/p?utm_a=1&utm_b=2",
      "https://a.com/p?utm_a=1&ref=7",
      "https://a.com/p?ref=7&utm_a=1",
      "https://a.com/p?b=2&a=1") === Seq(
      "https://a.com/p", "https://a.com/p", "https://a.com/p?ref=7",
      "https://a.com/p?ref=7", "https://a.com/p?b=2&a=1"))
  }

  test("utm_ matches only at a param-NAME start: path segments, values," +
      " and consecutive runs survive intact") {
    assert(canon(
      // literal utm_ inside a path segment: untouched
      "https://h.com/utm_x?a=1&b=2",
      // utm_ inside a parameter VALUE: untouched
      "https://h.com/p?q=utm_test&b=2",
      // a run of consecutive utm params between kept ones
      "https://h.com/p?a=1&utm_a=1&utm_b=2&utm_c=3&z=9",
      // key merely CONTAINING utm_ (not a prefix): kept
      "https://h.com/p?xutm_k=9&utm_a=1") === Seq(
      "https://h.com/utm_x?a=1&b=2",
      "https://h.com/p?q=utm_test&b=2",
      "https://h.com/p?a=1&z=9",
      "https://h.com/p?xutm_k=9"))
  }

  test("non-URL input passes through unchanged (fail-safe)") {
    assert(canon("not a url", "relative/path?utm_a=1") ===
      Seq("not a url", "relative/path?utm_a=1"))
  }

  test("dedupByUrl groups variants under one representative") {
    val df = Seq(
      (1L, "https://a.com/x"),
      (2L, "HTTPS://WWW.A.COM/x/"),
      (3L, "https://a.com/x#f"),
      (4L, "https://a.com/y")).toDF("id", "url")
    val out = UrlOps.dedupByUrl(df, "url", "id")
      .orderBy("canonical_url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("https://a.com/x", 3L, 1L), ("https://a.com/y", 1L, 4L)))
  }

  test("negativeSample: never collides, <= k per user, deterministic") {
    val P = 1000000007L
    val pos = Seq((1L, 3L), (1L, 7L), (2L, 0L), (2L, 1L), (2L, 2L))
      .toDF("u", "item")
    def run() = Curation.negativeSample(pos, "u", "item", k = 4, itemSpace = 10L)
      .orderBy("u", "draw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run()
    assert(out.toSeq === run().toSeq, "deterministic")
    val posSet = Set((1L, 3L), (1L, 7L), (2L, 0L), (2L, 1L), (2L, 2L))
    assert(out.forall { case (u, _, it) => !posSet((u, it)) },
      "no negative is a true interaction")
    assert(out.groupBy(_._1).forall(_._2.length <= 4))
    // the hash replays locally: item = ((u mod P)*A + i*B) mod space
    out.foreach { case (u, i, it) =>
      assert(it === ((u % P) * 26544357L + i * 40503L) % 10L)
    }
  }

  test("merged per-slice url-dedup states equal the one-shot pass") {
    val df = Seq(
      (1L, "https://a.com/x"), (2L, "HTTPS://WWW.A.COM/x/"),
      (3L, "https://a.com/x#f"), (4L, "https://a.com/y"),
      (5L, "https://a.com/x?utm_s=1"), (6L, "https://b.com/z/")
    ).toDF("id", "url")
    val tiles = (0 until 3).map(d => UrlOps.dedupByUrl(
      df.filter(pmod(col("id"), lit(3L)) === d), "url", "id"))
    val merged = UrlOps.mergeUrlDedupStates(
      tiles.reduce(_ unionByName _)).orderBy("canonical_url").collect()
    val oneShot = UrlOps.dedupByUrl(df, "url", "id")
      .orderBy("canonical_url").collect()
    assert(merged.toSeq === oneShot.toSeq)
  }

  test("asof nearest: closer side wins, ties prefer at-or-before") {
    // left at t=10: backward at 7 (d=3), forward at 12 (d=2) -> forward
    // left at t=20: backward at 18 (d=2), forward at 22 (d=2) -> tie -> backward
    // left at t=30: only backward exists -> backward
    // left key B: no right rows -> nulls
    val left = Seq(("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
      ("B", 5L, 4L)).toDF("k", "t", "lid")
    val right = Seq(("A", 7L, 70L), ("A", 12L, 120L), ("A", 18L, 180L),
      ("A", 22L, 220L)).toDF("k", "t", "rid")
    val out = graft.ops.AsOfJoin.nearest(left, right, Seq("k"), "t",
        pick = Seq("rid"), suffix = "_n", tiebreakCol = Some("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, Some(120L)), (2L, Some(180L)), (3L, Some(220L)), (4L, None)))
  }
}
