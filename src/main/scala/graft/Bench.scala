package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // fixture events.parquet stores TIMESTAMP(NANOS): read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT/codegen/classloading and file-listing otherwise land in
    // whichever query happens to run first (observed +20s on the first
    // timed query). One cheap pass over each input plus a tiny job.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries.get("etl_pipeline_json").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // Two timed passes, best-of per query: this box shows double-digit
    // hypervisor steal time in bursts (observed 17% st in top), which
    // can inflate any single measurement ~10x. The min of two passes is
    // a far better steady-state estimate under stolen CPU.
    // A failed query records the -1.0 sentinel (NOT its elapsed time) so
    // the JSON cannot report success-shaped numbers for a broken query.
    // Optional comma-separated query-name filter for targeted re-measuring
    // (SPARK_GRAFT_BENCH_ONLY); full suite when unset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchQueries = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    def timedPass(): Map[String, Double] = benchQueries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = timedPass()
    val p2 = timedPass()
    val results = p1.map { case (k, v1) =>
      val v2 = p2.getOrElse(k, -1.0)
      val oks = Seq(v1, v2).filter(_ >= 0.0)
      k -> (if (oks.isEmpty) -1.0 else oks.min)
    }
    val failed = results.collect { case (k, v) if v < 0.0 => k }.toSeq.sorted
    // Millisecond precision: the consumer captures only a bounded tail of
    // the build output, so the one-line JSON must stay well under 2 KB
    // even at 70+ queries — nanosecond digits are noise under the
    // documented hypervisor steal anyway.
    def fmt(dp: Int)(v: Double): String = if (v < 0.0) "-1" else s"%.${dp}f".format(v)
    // ASCENDING by time: if the consumer's bounded tail still cuts the
    // head of the line, what's lost is the cheapest (least informative)
    // entries — the slow, diagnostic ones sit at the end, inside the tail.
    def renderQs(dp: Int): String =
      results.toSeq.sortBy { case (_, v) => if (v < 0.0) Double.MaxValue else v }
        .map { case (k, v) => s"\"" + k + "\":" + fmt(dp)(v) }
        .mkString("{", ",", "}")
    val qs3 = renderQs(3)
    val qs = if (qs3.length <= 1700) qs3 else renderQs(2)
    val f = fmt(3) _
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0.0).sum
    // A filtered run is structurally distinguishable from a full-suite
    // run: it carries the filter it ran under, so a stale
    // SPARK_GRAFT_BENCH_ONLY can never produce a success-shaped partial
    // result that masquerades as the full contract.
    val onlyJson = only match {
      case Some(names) =>
        names.toSeq.sorted.map("\"" + _ + "\"").mkString(""","only":[""", ",", "]")
      case None => ""
    }
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"failed":$failedJson$onlyJson,"sf":"$sfDir"}"""
    println(json)
    // stdout is interleaved with sbt/log4j noise; the file copy makes the
    // bench contract robust to prefix mangling. Filtered runs default to
    // a DIFFERENT file so they cannot clobber a full-suite bench_out.json.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "bench_only_out.json" else "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () }
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED queries: $failed")
    spark.stop()
  }
}
