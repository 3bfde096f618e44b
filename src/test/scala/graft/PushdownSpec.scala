package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-shape assertions across the driver queries: projections must
  * prune to the columns a query actually reads (a scan that reads all
  * columns for a 2-column projection re-reads the whole corpus at 100 TB),
  * and filters on scan columns must reach the parquet reader. */
class PushdownSpec extends SparkTestBase {

  /** Parquet scans in the pre-AQE physical plan (fixtures read through
    * the DSv1 parquet source -> FileSourceScanExec). */
  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  private def readColumns(df: DataFrame): Seq[Set[String]] = {
    val ss = scans(df)
    assert(ss.nonEmpty, "no parquet scan found in plan")
    ss.map(_.requiredSchema.fieldNames.toSet)
  }

  test("text_chunk reads only (doc_id, text) from documents") {
    val df = SparkEntry.queries("text_chunk")(spark, sf())
    val cols = readColumns(df)
    assert(cols.forall(_.subsetOf(Set("doc_id", "text"))),
      s"unpruned documents scan: $cols")
  }

  test("text_repetition reads only (doc_id, text)") {
    val df = SparkEntry.queries("text_repetition")(spark, sf())
    assert(readColumns(df).forall(_.subsetOf(Set("doc_id", "text"))))
  }

  test("emb_quantize reads only (vec_id, embedding)") {
    val df = SparkEntry.queries("emb_quantize")(spark, sf())
    assert(readColumns(df).forall(_.subsetOf(Set("vec_id", "embedding"))))
  }

  test("q1_pricing_summary pushes the shipdate filter into the parquet scan") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf())
    val pushed = scans(df).flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"),
      s"no pushed l_shipdate filter in scan: $pushed")
    // and the lineitem read schema is pruned (16 physical columns exist)
    assert(readColumns(df).forall(_.size <= 7), "unpruned lineitem scan")
  }

  test("q3_revenue_topk pushes mktsegment + date filters into the scans") {
    val df = SparkEntry.queries("q3_revenue_topk")(spark, sf())
    val pushed = scans(df).flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("c_mktsegment") && pushed.contains("o_orderdate"),
      s"missing pushed filters: $pushed")
  }

  test("split_train_test reads only doc_id") {
    val df = SparkEntry.queries("split_train_test")(spark, sf())
    assert(readColumns(df).forall(_.subsetOf(Set("doc_id"))))
  }
}
