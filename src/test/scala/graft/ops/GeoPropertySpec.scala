package graft.ops

import graft.SparkTestBase

/** Seeded property batteries for the geo family: the grid radius join
  * against brute force across many configurations (boundary-aligned
  * radii, negative quadrants, degenerate spans), and the convex
  * geofence against the exact triangle-area-sum identity — an
  * independent integer formulation of containment. */
class GeoPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("gridRadiusJoin == brute force across 30 seeded configurations") {
    for (cfg <- 0 until 30) {
      val rnd = new scala.util.Random(1000L + cfg)
      val span = Seq(500L, 3000L, 20000L)(cfg % 3)
      val offset = Seq(0L, -span / 2, -span * 2)((cfg / 3) % 3)
      // every third config uses a radius that divides the lattice span,
      // maximizing exact cell-boundary and radius-boundary hits
      val radius = if (cfg % 3 == 0) span / 5 else 1L + math.abs(rnd.nextLong()) % span
      val nl = 40 + rnd.nextInt(60)
      val nr = 30 + rnd.nextInt(60)
      // quantized lattice: many exact collisions and boundary distances
      def pt() = (offset + (math.abs(rnd.nextLong()) % span) / 10 * 10,
        offset + (math.abs(rnd.nextLong()) % span) / 10 * 10)
      val ls = (0 until nl).map(i => { val (a, b) = pt(); (i.toLong, a, b) })
      val rs = (0 until nr).map(i => { val (a, b) = pt(); (i.toLong, a, b) })
      val got = Geo.gridRadiusJoin(ls.toDF("lid", "lat_u", "lon_u"),
          rs.toDF("rid", "lat_u", "lon_u"), "lat_u", "lon_u", radius)
        .select("lid", "rid", "dist2").as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (li, la, lo) <- ls
        (ri, ra, ro) <- rs
        d2 = (la - ra) * (la - ra) + (lo - ro) * (lo - ro)
        if d2 <= radius * radius
      } yield (li, ri, d2)).toSet
      assert(got == want, s"cfg=$cfg span=$span offset=$offset radius=$radius")
    }
  }

  test("geofence == exact triangle-area-sum identity over random convex hulls") {
    def hull(pts: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      // Andrew's monotone chain, strict turns (no collinear hull points)
      val sorted = pts.distinct.sortBy(identity)
      def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)) =
        (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
      def half(ps: Seq[(Long, Long)]) = {
        val h = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        ps.foreach { p =>
          while (h.size >= 2 && cross(h(h.size - 2), h(h.size - 1), p) <= 0)
            h.remove(h.size - 1)
          h += p
        }
        h.toSeq
      }
      val lower = half(sorted)
      val upper = half(sorted.reverse)
      lower.dropRight(1) ++ upper.dropRight(1)
    }
    def area2(vs: Seq[(Long, Long)]): Long =
      vs.indices.map { i =>
        val (ax, ay) = vs(i); val (bx, by) = vs((i + 1) % vs.size)
        ax * by - bx * ay
      }.sum
    def triSum(vs: Seq[(Long, Long)], p: (Long, Long)): Long =
      vs.indices.map { i =>
        val a = vs(i); val b = vs((i + 1) % vs.size)
        math.abs((a._1 - p._1) * (b._2 - p._2) - (a._2 - p._2) * (b._1 - p._1))
      }.sum
    for (seed <- 0 until 12) {
      val rnd = new scala.util.Random(7000L + seed)
      val cloud = (0 until 12).map(_ =>
        (rnd.nextLong(2000L) - 1000L, rnd.nextLong(2000L) - 1000L))
      val poly = hull(cloud)
      if (poly.size >= 3) {
        val probes = (0 until 120).map(i =>
          (i.toLong, rnd.nextLong(2400L) - 1200L, rnd.nextLong(2400L) - 1200L)) ++
          poly.zipWithIndex.map { case ((x, y), i) => (1000L + i, x, y) } // vertices
        val got = Geo.pointInConvexPolygon(
            probes.toDF("id", "lat_u", "lon_u"), "lat_u", "lon_u", poly)
          .select("id", "inside").as[(Long, Boolean)].collect().toMap
        val a2 = area2(poly)
        probes.foreach { case (id, x, y) =>
          val want = triSum(poly, (x, y)) == a2
          assert(got(id) == want, s"seed=$seed point=($x,$y) poly=$poly")
        }
        // vertices must be inside (boundary-inclusive)
        poly.indices.foreach(i => assert(got(1000L + i)))
      }
    }
  }
}
