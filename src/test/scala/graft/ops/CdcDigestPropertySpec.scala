package graft.ops

import graft.SparkTestBase

/** Randomized battery for the merkle table digests. Both failure
  * directions are silent in production: a digest that varies with row
  * order or partitioning would flag identical replicas as divergent on
  * every run (false diff), and a digest blind to a single-cell edit,
  * insert, or delete would certify a corrupt replica (false equal —
  * the dangerous one). 20 random tables, each mutated one random way.
  */
class CdcDigestPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] =
    Cdc.tableDigest(df, keys = Seq("k"), buckets = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("digests: partitioning/order independent; any mutation flips them — 20 scenarios") {
    (0 until 20).foreach { scenario =>
      val rnd = new scala.util.Random(scenario)
      val n = 50 + rnd.nextInt(150)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(1000).toLong, s"p_${rnd.nextInt(50)}"))
      val base = rows.toDF("k", "v", "tag")
      // same rows, shuffled order, different partitioning -> same digests
      val permuted = rnd.shuffle(rows).toDF("k", "v", "tag").repartition(1 + rnd.nextInt(12))
      assert(snap(base) === snap(permuted), s"scenario $scenario: false diff")
      // one random mutation -> digestDiff must surface a dirty bucket,
      // and drillDiff must name exactly the touched key
      val (mutated, touchedKey) = rnd.nextInt(3) match {
        case 0 => // single-cell update
          val k = rnd.nextInt(n).toLong
          (rows.map { case (rk, v, t) => if (rk == k) (rk, v + 1, t) else (rk, v, t) }, k)
        case 1 => // delete
          val k = rnd.nextInt(n).toLong
          (rows.filterNot(_._1 == k), k)
        case _ => // insert
          (rows :+ ((n + 1000).toLong, 7L, "new"), (n + 1000).toLong)
      }
      val mdf = mutated.toDF("k", "v", "tag")
      val dirty = Cdc.digestDiff(base, mdf, keys = Seq("k"), buckets = 16)
      assert(dirty.count() >= 1, s"scenario $scenario: false equal — mutation invisible")
      val drilled = Cdc.drillDiff(base, mdf, keys = Seq("k"), buckets = 16)
        .select("k").collect().map(_.getLong(0)).toSet
      assert(drilled === Set(touchedKey),
        s"scenario $scenario: drill found $drilled, expected $touchedKey")
    }
  }
}
