package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Features}
import graft.ops.{Relational, Skew}

/** Shared-session service smoke: a multi-tenant deployment runs MANY
  * queries concurrently on ONE SparkSession, so no operator may depend
  * on session-global mutable state (conf, fixed-name temp views) or on
  * being the only query in flight. This spec runs a heterogeneous mix —
  * the iterative components loop (per-frame parallelism), the SQL entry
  * path (per-invocation views), salted join, mode, quantile binning —
  * in parallel threads and asserts every result matches its sequential
  * baseline.
  */
class ConcurrentSessionSpec extends SparkTestBase {
  import spark.implicits._

  test("heterogeneous operator mix on one session: concurrent == sequential") {
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val skewBig = (1L to 3000L).map(i => (if (i % 3 == 0) 1L else i, i)).toDF("k", "payload")
    val skewDim = Seq((1L, "hot"), (2L, "cold")).toDF("k", "attr")
    val modeDf = (0 until 900).map(i => (i % 4L, s"v${i % 11 % (i % 4 + 1)}")).toDF("g", "v")
    val binDf = (0 until 800).map(i => (i.toLong, (i % 16).toLong)).toDF("id", "v")

    // sequential baselines
    val seqComponents = Dedup.components(pairs, maxRounds = 20)
      .as[(Long, Long)].collect().toSet
    val seqSql = Relational.sqlInterface(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val seqSalted = Skew.saltedJoin(skewBig, skewDim, Seq("k"), salts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val seqMode = Relational.modePerGroup(modeDf, Seq("g"), "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val seqBins = Features.quantileBinsDiscrete(binDf, "v", k = 4, binCol = "bin")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2))).toSet

    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.Future
      // two interleaved rounds of the full mix
      val futures = (1 to 2).flatMap { _ =>
        Seq(
          Future(("components", Dedup.components(pairs, maxRounds = 20)
            .as[(Long, Long)].collect().toSet == seqComponents)),
          Future(("sql", Relational.sqlInterface(spark, sf()).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet == seqSql)),
          Future(("salted", Skew.saltedJoin(skewBig, skewDim, Seq("k"), salts = 4)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet == seqSalted)),
          Future(("mode", Relational.modePerGroup(modeDf, Seq("g"), "v")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == seqMode)),
          Future(("bins", Features.quantileBinsDiscrete(binDf, "v", k = 4, binCol = "bin")
            .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2))).toSet == seqBins)))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      val wrong = results.filterNot(_._2).map(_._1)
      assert(wrong.isEmpty, s"operators diverged under concurrency: ${wrong.distinct.mkString(",")}")
    } finally pool.shutdown()
    // and the session shows no residue from THESE operators: conf
    // intact, no sqlInterface views left behind (other suites share
    // this session and may hold their own fixture views — only views
    // this spec's operators could have created count as residue)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    val leaked = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("v_orders"))
    assert(leaked.isEmpty, s"sqlInterface leaked views: ${leaked.mkString(",")}")
  }

  test("round-9 families on one session: concurrent == sequential") {
    // the geo grid join (explode + equi-join), ACF (lag Expand + join),
    // Fellegi-Sunter (pure projection), and clustering coefficient
    // (iterative-free but Materialize-using) share one session in
    // parallel — none may depend on fixed-name views or session conf
    val rnd = new scala.util.Random(77L)
    val lpts = (0 until 150).map(i => (i.toLong, rnd.nextLong(8000L), rnd.nextLong(8000L)))
      .toDF("lid", "lat_u", "lon_u")
    val rpts = (0 until 100).map(i => (i.toLong, rnd.nextLong(8000L), rnd.nextLong(8000L)))
      .toDF("rid", "lat_u", "lon_u")
    val series = (1L to 50L).map(t => ("k", t, (t % 7).toDouble)).toDF("g", "t", "x")
    val fsPairs = (0 until 200).map(i => (i.toLong, i % 3 == 0, i % 5 == 0))
      .toDF("id", "f1", "f2")
    val edges = (0L until 60L).flatMap(i => Seq((i, (i + 1) % 60), (i, (i + 2) % 60)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      .toDF("u", "v")

    val seqGeo = graft.ops.Geo.gridRadiusJoin(lpts, rpts, "lat_u", "lon_u", 600L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val seqAcf = graft.ops.TimeSeries.acf(series, "g", "t", "x", 2)
      .select("lag", "acf_micro").as[(Long, Long)].collect().toSet
    val seqFs = Dedup.fellegiSunter(fsPairs,
        Seq(("f1", 3L, -2L), ("f2", 2L, -1L)), 3L, 0L)
      .select("id", "fs_class").as[(Long, String)].collect().toSet
    val seqCc = graft.ops.Graph.clusteringCoefficient(edges)
      .select("node", "cc_micro").as[(Long, Long)].collect().toSet

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.Future
      val futures = (1 to 2).flatMap { _ =>
        Seq(
          Future(("geo", graft.ops.Geo.gridRadiusJoin(lpts, rpts, "lat_u", "lon_u", 600L)
            .select("lid", "rid").as[(Long, Long)].collect().toSet == seqGeo)),
          Future(("acf", graft.ops.TimeSeries.acf(series, "g", "t", "x", 2)
            .select("lag", "acf_micro").as[(Long, Long)].collect().toSet == seqAcf)),
          Future(("fs", Dedup.fellegiSunter(fsPairs,
              Seq(("f1", 3L, -2L), ("f2", 2L, -1L)), 3L, 0L)
            .select("id", "fs_class").as[(Long, String)].collect().toSet == seqFs)),
          Future(("cc", graft.ops.Graph.clusteringCoefficient(edges)
            .select("node", "cc_micro").as[(Long, Long)].collect().toSet == seqCc)))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      val wrong = results.filterNot(_._2).map(_._1)
      assert(wrong.isEmpty, s"operators diverged under concurrency: ${wrong.distinct.mkString(",")}")
    } finally pool.shutdown()
  }

  test("SQL-TVF driver rows on one session: concurrent == sequential") {
    // The TVF rows register temp views on the shared session; every
    // registration is now per-invocation-named, so the same row twice in
    // flight — and the historically name-colliding dq_psi_sql/dq_ks_sql
    // pair (both once used graft_dq_ref_v/graft_dq_cur_v) — must agree
    // with their sequential baselines and leave no view residue.
    val rows = Seq("dq_psi_sql", "dq_ks_sql", "q_spearman_sql",
      "geo_hotspot_sql", "exp_mw_sql")
    def run(name: String): Set[Seq[Any]] =
      SparkEntry.queries(name)(spark, sf()).collect().map(_.toSeq.toVector).toSet
    val baseline = rows.map(n => n -> run(n)).toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.Future
      val futures = (1 to 2).flatMap(_ => rows.map(n => Future(n -> (run(n) == baseline(n)))))
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      val wrong = results.filterNot(_._2).map(_._1)
      assert(wrong.isEmpty, s"TVF rows diverged under concurrency: ${wrong.distinct.mkString(",")}")
    } finally pool.shutdown()
    val leaked = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_dq_") || n.startsWith("graft_spearman_v") ||
        n.startsWith("graft_hotspot_pts_v") || n.startsWith("graft_mw_v"))
    assert(leaked.isEmpty, s"TVF rows leaked views: ${leaked.mkString(",")}")
  }

  test("streaming replay never mutates the parent session's conf (isolated clone)") {
    // The streaming contract rows scope shuffle.partitions down to 4 for
    // their state stores. With set/restore-in-finally scoping, a
    // concurrent batch query could observe the scoped-down value during
    // the replay window; running the replay on a newSession() clone must
    // make that impossible. Pin the parent to a distinguishable value
    // and poll it throughout the drain.
    import scala.jdk.CollectionConverters._
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "7")
    try {
      @volatile var polling = true
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val poller = new Thread(() => {
        while (polling) { seen.add(spark.conf.get(key)); Thread.sleep(1) }
      })
      poller.start()
      val rows = SparkEntry.queries("stream_tumbling")(spark, sf()).collect()
      polling = false
      poller.join()
      assert(rows.nonEmpty)
      assert(seen.asScala.toSet === Set("7"),
        s"parent conf observed ${seen.asScala.toSet} during streaming replay")
    } finally spark.conf.set(key, prev)
  }
}
