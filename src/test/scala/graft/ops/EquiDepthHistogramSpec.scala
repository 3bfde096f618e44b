package graft.ops

import graft.SparkTestBase

class EquiDepthHistogramSpec extends SparkTestBase {

  import spark.implicits._

  test("equiDepthHistogram: even split — equal counts, tight contiguous bounds") {
    val df = (1 to 20).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id")
    val out = Relational.equiDepthHistogram(df, "grp", "v", "id", buckets = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === (1 to 5))
    assert(out.forall(_._2 == 4L)) // 20 rows / 5 buckets
    assert(out.map(t => (t._3, t._4)).toSeq ===
      Seq((1.0, 4.0), (5.0, 8.0), (9.0, 12.0), (13.0, 16.0), (17.0, 20.0)))
  }

  test("equiDepthHistogram: uneven split follows ntile (front buckets one larger)") {
    val df = (1 to 7).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id")
    val out = Relational.equiDepthHistogram(df, "grp", "v", "id", buckets = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1, 3L), (2, 2L), (3, 2L)))
  }

  test("equiDepthHistogram: per-group independence and ordered non-overlapping bounds") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (if (i % 3 == 0) "a" else "b", rnd.nextInt(50).toDouble, i.toLong)
    }
    val out = Relational.equiDepthHistogram(rows.toDF("grp", "v", "id"), "grp", "v", "id", buckets = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    for (g <- Seq("a", "b")) {
      val bs = out.filter(_._1 == g).sortBy(_._2)
      assert(bs.map(_._2).toSeq === (1 to 4))
      assert(bs.map(_._3).sum === rows.count(_._1 == g))
      // depths differ by at most 1 (equi-depth), bounds are monotone
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1)
      bs.sliding(2).foreach { case Array(p, n) => assert(p._5 <= n._4 + 1e-9) case _ => }
    }
  }

  test("equiDepthHistogram: rejects fewer than 2 buckets") {
    val df = Seq(("g", 1.0, 1L)).toDF("grp", "v", "id")
    intercept[IllegalArgumentException] {
      Relational.equiDepthHistogram(df, "grp", "v", "id", buckets = 1)
    }
  }
}
