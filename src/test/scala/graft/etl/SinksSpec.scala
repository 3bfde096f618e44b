package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class SinksSpec extends SparkTestBase {

  test("csvSingleFile writes exactly one readable CSV file") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name").repartition(3)
    val out = Files.createTempDirectory("sink").resolve("out.csv").toString
    Sinks.csvSingleFile(df, out)
    assert(Files.isRegularFile(Paths.get(out)))
    val back = spark.read.option("header", true).csv(out)
    assert(back.count() === 3)
    assert(back.columns.toSeq === Seq("id", "name"))
    assert(!Files.exists(Paths.get(out + ".__graft_tmp")))
  }

  test("partitionBy parquet sink enables partition pruning on read") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i, s"g${i % 4}", i * 1.5)).toDF("id", "grp", "v")
    val out = Files.createTempDirectory("psink").resolve("t").toString
    Sinks.parquetDir(df, out, partitionBy = Seq("grp"))
    val read = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("grp") === "g1")
    assert(read.count() === 25)
    // pruning: only the g1 directory is scanned
    val scan = read.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.metadata("PartitionFilters").contains("grp"),
      s"partition filter missing: ${scan.metadata}")
    assert(scan.selectedPartitions.partitionCount === 1)
  }

  test("csvDir writes a partitioned directory") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i, s"r$i")).toDF("id", "name").repartition(4)
    val out = Files.createTempDirectory("sinkdir").resolve("out").toString
    Sinks.csvDir(df, out)
    assert(spark.read.option("header", true).csv(out).count() === 100)
  }
}
