package graft

import graft.SparkTestBase

class GraftExtensionsSpec extends SparkTestBase {

  test("native expressions usable from SQL after registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a b c d", Array(1.0, 0.0)), ("a b c d", Array(0.0, 1.0)))
      .toDF("text", "vec").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT
        |  size(minhash_signature(shingle_hashes(text, 3), 16)) AS sig_len,
        |  simhash64(token_hashes(text)) AS sh,
        |  cosine_similarity(vec, vec) AS self_cos,
        |  srp_signature(vec, 8) AS srp
        |FROM t""".stripMargin).collect()
    assert(row.length === 2)
    assert(row.head.getAs[Int]("sig_len") === 16)
    assert(row(0).getAs[Long]("sh") === row(1).getAs[Long]("sh")) // same text
    assert(math.abs(row.head.getAs[Double]("self_cos") - 1.0) < 1e-12)
  }

  test("SQL results agree with the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("the quick brown fox jumps").toDF("text")
    val viaSql = df.selectExpr("simhash64(token_hashes(text)) AS s").collect().head.getLong(0)
    val viaApi = df.select(graft.ext.Dedup.simhashOfText(col("text")).as("s"))
      .collect().head.getLong(0)
    assert(viaSql === viaApi)
  }

  test("bounded_levenshtein from SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("kitten", "sitting"), ("same", "same"), ("abc", "abd"))
      .toDF("a", "b").createOrReplaceTempView("lev_t")
    val got = spark.sql("SELECT bounded_levenshtein(a, b, 2) FROM lev_t")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(3, 0, 1)) // kitten/sitting is distance 3 -> capped at k+1
  }

  test("deletion_hashes from SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq("ab").toDF("s").createOrReplaceTempView("del_t")
    val got = spark.sql("SELECT size(deletion_hashes(s, 1)) FROM del_t")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(3)) // {ab, a, b}
  }

  test("graft_asof table-valued function equals the Scala API plan") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u2", 15L))
      .toDF("event_id", "user_id", "ts").createOrReplaceTempView("tvf_left")
    Seq(("u1", 5L, 100L), ("u1", 20L, 101L), ("u2", 30L, 102L))
      .toDF("user_id", "ts", "err_id").createOrReplaceTempView("tvf_right")
    def pairs(rows: Array[org.apache.spark.sql.Row]): Seq[(Long, Long)] =
      rows.map { r =>
        val pick = r.getAs[Any]("err_id_asof")
        (r.getAs[Long]("event_id"), if (pick == null) -1L else pick.asInstanceOf[Long])
      }.toSeq
    val viaSql = pairs(spark.sql(
      """SELECT event_id, user_id, err_id_asof
        |FROM graft_asof('tvf_left', 'tvf_right', 'user_id', 'ts',
        |                'err_id', 'backward', 'err_id', '_asof')""".stripMargin)
      .orderBy("event_id").collect())
    val viaApi = pairs(graft.ops.AsOfJoin.backward(
      spark.table("tvf_left"), spark.table("tvf_right"),
      keys = Seq("user_id"), tsCol = "ts", pick = Seq("err_id"),
      tiebreakCol = Some("err_id"))
      .orderBy("event_id").collect())
    // ts=20 is an exact-ts match (inclusive); u2's event at 15 precedes
    // its only error at 30 -> null
    assert(viaSql === Seq((1L, 100L), (2L, 101L), (3L, -1L)))
    assert(viaSql === viaApi)
  }

  test("graft_asof forward direction from SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "u1", 10L)).toDF("event_id", "user_id", "ts")
      .createOrReplaceTempView("tvf_fwd_left")
    Seq(("u1", 5L, 100L), ("u1", 12L, 101L)).toDF("user_id", "ts", "err_id")
      .createOrReplaceTempView("tvf_fwd_right")
    val got = spark.sql(
      """SELECT err_id_asof FROM graft_asof('tvf_fwd_left', 'tvf_fwd_right',
        |  'user_id', 'ts', 'err_id', 'forward', 'err_id', '_asof')""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(101L)) // next err at-or-after ts=10 is ts=12
  }

  test("graft_bloom_semi table-valued function equals the plain semi join") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (1L to 2000L).map(i => (i, i % 17)).toDF("pk", "payload")
      .createOrReplaceTempView("tvf_bloom_probe")
    (1L to 2000L).filter(_ % 19 == 0).toDF("bk")
      .createOrReplaceTempView("tvf_bloom_build")
    val got = spark.sql(
      """SELECT pk FROM graft_bloom_semi('tvf_bloom_probe', 'tvf_bloom_build',
        |  'pk', 'bk') ORDER BY pk""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val want = (1L to 2000L).filter(_ % 19 == 0)
    assert(got === want)
  }

  test("graft_theta_overlap table-valued function equals brute-force set algebra") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = (0 until 600).map(i => (s"seg_${i % 3}", (i * 7 % 101).toLong))
    rows.toDF("seg", "id").createOrReplaceTempView("tvf_theta_t")
    val got = spark.sql(
      "SELECT * FROM graft_theta_overlap('tvf_theta_t', 'seg', 'id', 12)")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      a <- truth.keys; b <- truth.keys if a < b
    } yield (a, b, truth(a).size.toLong, truth(b).size.toLong,
        (truth(a) & truth(b)).size.toLong)).toSet
    assert(got === want)
  }

  test("graft_sketch_dau_mau table-valued function equals the Scala face") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // nanosecond timestamps over 5 days, 40 users — exact mode at lgK 12
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { _ =>
      (86400L * rnd.nextInt(5) * 1000000000L + rnd.nextInt(86400) * 1000000000L,
        rnd.nextInt(40).toLong)
    }
    val df = rows.toDF("ts", "user_id")
    df.createOrReplaceTempView("tvf_daumau_t")
    val got = spark.sql("SELECT * FROM graft_sketch_dau_mau('tvf_daumau_t', 3, 12)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.ops.Sketches.dauMau(df, windowDays = 3, lgK = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("graft_sketch_quantiles table-valued function equals exact order statistics") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = (0 until 900).map(i => (s"g${i % 3}", (i * 37 % 113).toDouble))
    rows.toDF("g", "v").createOrReplaceTempView("tvf_kll_t")
    val got = spark.sql(
      "SELECT * FROM graft_sketch_quantiles('tvf_kll_t', 'g', 'v', '0.5,1.0', 2048)")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      Seq(0.5, 1.0).map(p =>
        (g, p, sorted(math.ceil(p * sorted.size).toInt - 1)))
    }.toSet
    assert(got === want)
  }

  test("graft_sketch_freq_items table-valued function equals exact counts") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // 4 groups x 6 items, every count distinct — far inside a 64-counter
    // map, so the sketch never purges and every estimate is exact
    val rows = for (g <- 0 until 4; i <- 0 until 6; _ <- 0 until (g * 6 + i + 1))
      yield (s"g$g", s"item$i")
    val df = rows.toDF("g", "item")
    df.createOrReplaceTempView("tvf_freq_t")
    val got = spark.sql(
      "SELECT grp, item, est FROM graft_sketch_freq_items('tvf_freq_t', 'g', 'item', 64)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = rows.groupBy(identity).map { case ((g, i), vs) => (g, i, vs.size.toLong) }.toSet
    assert(got === want && got.size === 24)
    // lb == est == ub in exact mode
    val bounds = spark.sql(
      "SELECT * FROM graft_sketch_freq_items('tvf_freq_t', 'g', 'item', 64)")
      .filter("lb <> est OR ub <> est").count()
    assert(bounds === 0L)
  }

  test("graft_skew_join table-valued function equals the plain join and the Scala face") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // key 1 hot (600 rows), keys 10-29 cold (5 rows each), key 999
    // misses the dimension
    val big = ((1 to 600).map(i => (1L, i.toLong)) ++
      (for (k <- 10 until 30; i <- 0 until 5) yield (k.toLong, i.toLong)) ++
      Seq((999L, 0L))).toDF("k", "payload")
    big.createOrReplaceTempView("tvf_skew_big")
    val dim = (Seq(1L) ++ (10L until 30L)).map(k => (k, s"a$k")).toDF("k", "attr")
    dim.createOrReplaceTempView("tvf_skew_dim")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    val viaSql = spark.sql(
      """SELECT * FROM graft_skew_join('tvf_skew_big', 'tvf_skew_dim',
        |  'k', 8, 'inner', 1.0, 100)""".stripMargin)
    // the SQL face took the split path (salted hot union plain cold)...
    val plan = viaSql.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("union") && plan.contains("__salt"))
    // ...and equals both the plain join and the Scala API result
    assert(canon(viaSql) === canon(big.join(dim, Seq("k"))))
    assert(canon(viaSql) === canon(graft.ops.Skew.autoSaltedJoin(
      big, dim, Seq("k"), salts = 8, sampleFraction = 1.0, hotRowThreshold = 100L)))
    // left join keeps the dimension-missing key
    val left = spark.sql(
      """SELECT * FROM graft_skew_join('tvf_skew_big', 'tvf_skew_dim',
        |  'k', 8, 'left', 1.0, 100)""".stripMargin)
    assert(canon(left) === canon(big.join(dim, Seq("k"), "left")))
  }

  test("drift/agreement TVFs equal their Scala faces row-for-row") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val ref = (1 to 300).map(i => i.toDouble % 37).toDF("v")
    val cur = (1 to 200).map(i => (i.toDouble % 31) + 3).toDF("v")
    ref.createOrReplaceTempView("tvf_drift_ref")
    cur.createOrReplaceTempView("tvf_drift_cur")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    assert(rows(spark.sql(
      "SELECT * FROM graft_psi_drift('tvf_drift_ref', 'tvf_drift_cur', 'v', 10)"))
      === rows(graft.ops.DataQuality.psiDrift(ref, cur, "v", 10)))
    assert(rows(spark.sql(
      "SELECT * FROM graft_ks_drift('tvf_drift_ref', 'tvf_drift_cur', 'v')"))
      === rows(graft.ops.DataQuality.ksDrift(ref, cur, "v")))
    val ann = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y")).toDF("a", "b")
    ann.createOrReplaceTempView("tvf_ann")
    assert(rows(spark.sql(
      "SELECT * FROM graft_cohens_kappa('tvf_ann', 'a', 'b')"))
      === rows(graft.ops.DataQuality.cohensKappa(ann, "a", "b")))
    val ratings = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B")).toDF("item", "label")
    ratings.createOrReplaceTempView("tvf_ratings")
    assert(rows(spark.sql(
      "SELECT * FROM graft_fleiss_kappa('tvf_ratings', 'item', 'label')"))
      === rows(graft.ops.DataQuality.fleissKappa(ratings, "item", "label")))
    val scored = (1 to 100).map(i => (i.toDouble % 17, i % 3 min 1)).toDF("s", "y")
    scored.createOrReplaceTempView("tvf_scored")
    assert(rows(spark.sql(
      "SELECT * FROM graft_roc_auc('tvf_scored', 's', 'y')"))
      === rows(graft.ops.DataQuality.rocAuc(scored, "s", "y")))
    val catRef = (1 to 120).map(i => "c" + (i % 5)).toDF("v")
    val catCur = (1 to 90).map(i => "c" + (i % 4)).toDF("v")
    catRef.createOrReplaceTempView("tvf_chi2_ref")
    catCur.createOrReplaceTempView("tvf_chi2_cur")
    assert(rows(spark.sql(
      "SELECT * FROM graft_chi2_drift('tvf_chi2_ref', 'tvf_chi2_cur', 'v')"))
      === rows(graft.ops.DataQuality.chi2Drift(catRef, catCur, "v")))
    assert(rows(spark.sql("SELECT * FROM graft_entropy('tvf_chi2_ref', 'v')"))
      === rows(graft.ops.DataQuality.categoryEntropy(catRef, "v")))
    val amounts = (1 to 200).map(i => (i * 37 % 997) / 10.0).toDF("amt")
    amounts.createOrReplaceTempView("tvf_amounts")
    assert(rows(spark.sql("SELECT * FROM graft_benford('tvf_amounts', 'amt', 100)"))
      === rows(graft.ops.DataQuality.benford(amounts, "amt", 100L)))
    val fd = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "a")).toDF("k", "dep")
    fd.createOrReplaceTempView("tvf_fd")
    assert(rows(spark.sql("SELECT * FROM graft_fd_check('tvf_fd', 'k', 'dep')"))
      === rows(graft.ops.DataQuality.fdViolations(fd, Seq("k"), "dep")))
    val wealth = (1 to 150).map(i => ("g" + (i % 3), (i * 13 % 97).toDouble))
      .toDF("grp", "w")
    wealth.createOrReplaceTempView("tvf_wealth")
    assert(rows(spark.sql("SELECT * FROM graft_gini('tvf_wealth', 'grp', 'w', 100)"))
      === rows(graft.ops.Relational.giniPerGroup(wealth, Seq("grp"), "w", 100L)))
  }

  test("dictionary_tags scalar function matches the Column face") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq("try Online, CASINO bonus? now", "order only", "")
      .toDF("text").createOrReplaceTempView("dict_scalar_t")
    val rows = spark.sql(
      "SELECT dictionary_tags(text, 'online casino,casino bonus,ord') FROM dict_scalar_t")
      .collect().map(_.getSeq[String](0).mkString(","))
    assert(rows.toSeq === Seq("casino bonus,online casino", "", ""))
  }

  test("graft_dict_tag TVF equals the Scala face") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq((0L, "try Online, CASINO bonus? now"), (1L, "order ord!"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_dict_docs")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    val dict = Seq("online casino", "casino bonus", "ord", "missing")
    assert(rows(spark.sql(
      s"SELECT * FROM graft_dict_tag('tvf_dict_docs', 'doc_id', 'text', '${dict.mkString(",")}')"))
      === rows(graft.ext.Curation.dictionaryTags(docs, dict)))
  }

  test("conformal TVFs equal their Scala faces") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val calib = (1 to 10).map(i => (i.toLong, "A", 100.0 + i, 100.0))
      .toDF("id", "g", "pred", "actual")
    val test0 = Seq((99L, "A", 50.0)).toDF("id", "g", "pred")
    calib.createOrReplaceTempView("tvf_conf_calib")
    test0.createOrReplaceTempView("tvf_conf_test")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    assert(rows(spark.sql(
      "SELECT * FROM graft_conformal('tvf_conf_calib', 'tvf_conf_test', 'pred', 'actual', 200000, 'id')"))
      === rows(graft.ops.Experiment.conformalIntervals(
        calib, test0, "pred", "actual", 200000L)))
    assert(rows(spark.sql(
      "SELECT * FROM graft_conformal_group('tvf_conf_calib', 'tvf_conf_test', 'g', 'pred', 'actual', 200000, 'id')"))
      === rows(graft.ops.Experiment.conformalIntervalsByGroup(
        calib, test0, "g", "pred", "actual", 200000L)))
  }

  test("nonparametric-test and CQR TVFs equal their Scala faces") {
    GraftExtensions.register(spark)
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    val two = (Seq.tabulate(8)(i => ("A", (i % 5 + 1).toDouble)) ++
      Seq.tabulate(6)(i => ("B", (i % 4 + 2).toDouble))).toDF("g", "v")
    two.createOrReplaceTempView("tvf_np_two")
    assert(rows(spark.sql(
      "SELECT * FROM graft_mannwhitney('tvf_np_two', 'g', 'v', 'A', 'B')"))
      === rows(graft.ops.Experiment.mannWhitney(two, "g", "v", "A", "B")))
    assert(rows(spark.sql(
      "SELECT * FROM graft_kruskal('tvf_np_two', 'g', 'v')"))
      === rows(graft.ops.Experiment.kruskalWallis(two, "g", "v")))
    val paired = (1 to 9).map(i => (i * 1.0, i * 1.0 + (i % 3) - 1))
      .toDF("pre", "post")
    paired.createOrReplaceTempView("tvf_np_paired")
    assert(rows(spark.sql(
      "SELECT * FROM graft_wilcoxon('tvf_np_paired', 'pre', 'post')"))
      === rows(graft.ops.Experiment.wilcoxonSignedRank(paired, "pre", "post")))
    val calib = (5 to 14).map(i => (i.toLong, 0.0, 10.0, i.toDouble))
      .toDF("id", "lo", "hi", "actual")
    val test0 = Seq((99L, 2.0, 8.0)).toDF("id", "lo", "hi")
    calib.createOrReplaceTempView("tvf_cqr_calib")
    test0.createOrReplaceTempView("tvf_cqr_test")
    assert(rows(spark.sql(
      "SELECT * FROM graft_cqr('tvf_cqr_calib', 'tvf_cqr_test', 'lo', 'hi', 'actual', 200000, 'id')"))
      === rows(graft.ops.Experiment.cqrIntervals(
        calib, test0, "lo", "hi", "actual", 200000L)))
  }

  test("mannWhitney state shards merge to the exact one-shot readout") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
      (i, if (i % 3 == 0L) "B" else "A", ((i * 17) % 23).toDouble))
      .toDF("id", "g", "v")
    val s0 = graft.ops.Experiment.mwValueState(
      df.filter($"id" % 2 === 0), "g", "v", "A", "B")
    val s1 = graft.ops.Experiment.mwValueState(
      df.filter($"id" % 2 === 1), "g", "v", "A", "B")
    val merged = graft.ops.Experiment
      .mannWhitneyFromState(s0.unionByName(s1)).head()
    val direct = graft.ops.Experiment
      .mannWhitney(df, "g", "v", "A", "B").head()
    assert(merged.toSeq === direct.toSeq)
  }

  test("arity errors are clear") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq("x").toDF("text").createOrReplaceTempView("t2")
    val e = intercept[Exception] {
      spark.sql("SELECT simhash64(text, 3) FROM t2").collect()
    }
    assert(e.getMessage.contains("expects 1 arguments") || e.getMessage.contains("simhash64"))
  }
}
