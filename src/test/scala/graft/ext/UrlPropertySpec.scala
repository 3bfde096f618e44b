package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Generative battery for the URL canonicalization regex chain — the
  * operator class where hand cases miss interactions (a utm param next
  * to a fragment next to a trailing slash). 300 seeded URLs are BUILT
  * from known components, so the expected canonical form is constructed
  * directly — no second regex implementation — and two invariants are
  * swept: construction-equality and idempotence (the canonical form is
  * a fixpoint of the chain). */
class UrlPropertySpec extends SparkTestBase {
  import spark.implicits._

  private case class Parts(scheme: String, www: Boolean, host: String,
      segs: Seq[String], trailing: Int, params: Seq[(String, String)],
      fragment: Option[String])

  private def render(p: Parts): String = {
    val hostCased = if (p.www) "WWW." + p.host.toUpperCase else p.host
    val path = p.segs.map("/" + _).mkString + "/" * p.trailing
    val query = if (p.params.isEmpty) ""
    else "?" + p.params.map { case (k, v) => s"$k=$v" }.mkString("&")
    p.scheme + "://" + hostCased + path + query + p.fragment.fold("")("#" + _)
  }

  /** The canonical form straight from the components. */
  private def expected(p: Parts): String = {
    val kept = p.params.filterNot(_._1.startsWith("utm_"))
    val path = p.segs.map("/" + _).mkString
    p.scheme.toLowerCase + "://" + p.host +
      (if (path.isEmpty) "/" else path) +
      (if (kept.isEmpty) "" else "?" + kept.map { case (k, v) => s"$k=$v" }.mkString("&"))
  }

  private def gen(seed: Long, n: Int): Seq[Parts] = {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    (0 until n).map { _ =>
      Parts(
        scheme = pick(Seq("http", "https", "HTTP", "HtTpS")),
        www = rnd.nextBoolean(),
        host = pick(Seq("alpha.example", "beta-cdn.example", "x9.example")),
        segs = Seq.fill(rnd.nextInt(4))(
          // "utm_seg" sweeps the literal prefix INSIDE a path segment —
          // the position the param-strip must never touch
          pick(Seq("Docs", "item", "p1", "Very-Long-Segment", "q", "utm_seg"))),
        trailing = rnd.nextInt(3),
        params = Seq.fill(rnd.nextInt(6))(
          // "q" -> "utm_test" puts the prefix in a VALUE; "xutm_k" is a
          // key merely containing it; both must survive the strip
          pick(Seq("utm_source" -> "feed", "utm_a" -> "1", "ref" -> "7",
            "id" -> "42", "utm_campaign" -> "x", "page" -> "3",
            "q" -> "utm_test", "xutm_k" -> "9"))),
        fragment = if (rnd.nextBoolean()) Some(pick(Seq("top", "sec2"))) else None)
    }
  }

  test("canonical form equals direct construction over 300 seeded URLs") {
    // NOTE one generator constraint mirrors the operator's documented
    // scope: duplicate param KEYS may repeat (fine — order preserved),
    // and utm params may sit anywhere, which is exactly the
    // interior/trailing regex seam the battery exists to sweep
    val parts = gen(20260815L, 300)
    val df = parts.map(render).toDF("url")
      .withColumn("canon", UrlOps.canonicalUrl(col("url")))
    val got = df.collect().map(_.getString(1))
    parts.zip(got).zipWithIndex.foreach { case ((p, g), i) =>
      assert(g === expected(p), s"case $i: ${render(p)}")
    }
  }

  test("canonicalization is idempotent: the canonical form is a fixpoint") {
    val urls = gen(7L, 300).map(render)
    val df = urls.toDF("url")
      .withColumn("c1", UrlOps.canonicalUrl(col("url")))
      .withColumn("c2", UrlOps.canonicalUrl(col("c1")))
    val bad = df.filter(col("c1") =!= col("c2")).collect()
    assert(bad.isEmpty, s"non-fixpoint cases: ${bad.take(5).mkString("; ")}")
  }

  test("no canonical query string retains a utm_-NAMED parameter") {
    // values and path segments MAY legitimately contain "utm_"; the
    // invariant is on parameter names only
    val urls = gen(99L, 300).map(render)
    val got = urls.toDF("url")
      .select(UrlOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    val bad = got.filter { c =>
      val q = c.dropWhile(_ != '?').drop(1)
      q.nonEmpty && q.split("&").exists(_.startsWith("utm_"))
    }
    assert(bad.isEmpty, s"utm param survived: ${bad.take(5).mkString("; ")}")
  }
}
