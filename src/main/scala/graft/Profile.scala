package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Measurement harness for the optimization rounds (guide §1: measure
  * first). Runs the named queries under the Bench session settings and
  * prints, per query: wall seconds, Spark job count, per-job wall time,
  * and per-stage shuffle read/write bytes + task time — the local
  * stand-in for the Spark UI (disabled under the bench). Also dumps
  * `.explain("formatted")` per query to plans/<tag>/<name>_<suffix>.txt
  * when SPARK_GRAFT_PLAN_DIR is set.
  *
  * Usage: sbt "runMain graft.Profile q1,q2,..." (env as Bench).
  */
object Profile {
  private final case class StageAgg(var taskTime: Long = 0L, var gc: Long = 0L,
    var shufRead: Long = 0L, var shufWrite: Long = 0L, var input: Long = 0L,
    var tasks: Int = 0, var maxTask: Long = 0L, var name: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")

    // warm-up identical to Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }

    val stages = mutable.Map[Int, StageAgg]()
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, Seq[Int])]() // id, t0, t1, stageIds
    val jobStart = mutable.Map[Int, (Long, Seq[Int])]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = (e.time, e.stageIds.map(_.toInt))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, sids) =>
          jobs += ((e.jobId, t0, e.time, sids)) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val a = stages.getOrElseUpdate(e.stageInfo.stageId, StageAgg())
        a.name = e.stageInfo.name
        Option(e.stageInfo.taskMetrics).foreach { m =>
          a.taskTime += m.executorRunTime; a.gc += m.jvmGCTime
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.input += m.inputMetrics.bytesRead
          a.tasks += e.stageInfo.numTasks
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[profile] unknown query: $name")
        case Some(fn) =>
          // pass 1: warm (plan/codegen), untimed detail
          try fn(spark, sfDir).count() catch { case t: Throwable =>
            println(s"[profile] $name FAILED warm pass: ${t.getMessage}") }
          stages.clear(); jobs.clear()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val n = df.count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let the listener bus drain
          val jobTot = jobs.map { case (_, a, b, _) => b - a }.sum / 1e3
          println(f"\n=== $name%s wall=$wall%.2fs rows=$n%d jobs=${jobs.size}%d jobWallSum=$jobTot%.2fs ===")
          jobs.sortBy { case (_, a, b, _) => a - b }.take(12).foreach { case (id, a, b, sids) =>
            val ms = b - a
            if (ms >= 50) {
              val ss = sids.flatMap(stages.get)
              val sr = ss.map(_.shufRead).sum / 1e6; val sw = ss.map(_.shufWrite).sum / 1e6
              val tt = ss.map(_.taskTime).sum / 1e3; val in = ss.map(_.input).sum / 1e6
              println(f"  job$id%4d ${ms / 1e3}%6.2fs stages=${sids.size}%2d taskTime=$tt%7.2fs in=$in%7.1fMB shufR=$sr%7.1fMB shufW=$sw%7.1fMB")
            }
          }
          val topStages = stages.toSeq.sortBy(-_._2.taskTime).take(8)
          topStages.foreach { case (sid, a) =>
            println(f"  stage$sid%5d taskTime=${a.taskTime / 1e3}%7.2fs gc=${a.gc / 1e3}%5.2fs tasks=${a.tasks}%4d in=${a.input / 1e6}%8.1fMB shufR=${a.shufRead / 1e6}%7.1fMB shufW=${a.shufWrite / 1e6}%7.1fMB  ${a.name.take(70)}%s")
          }
          planDir.foreach { pd =>
            val p = java.nio.file.Paths.get(pd)
            java.nio.file.Files.createDirectories(p)
            try java.nio.file.Files.writeString(p.resolve(s"${name}_$suffix.txt"),
              fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
            catch { case t: Throwable =>
              println(s"[profile] $name explain failed: ${t.getMessage}") }
          }
      }
    }
    spark.stop()
  }
}
