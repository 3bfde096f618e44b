package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level quarantine: the reference isolates BAD RULES at compile
  * time (rajatparida125/etl-tool-rep main.py:143-171 report-and-skip);
  * production loads also need BAD ROWS isolated at runtime — a value
  * that fails its declared type must not poison the load or silently
  * become NULL. `typedSplit` tags every row with the list of columns
  * whose cast fails (`try_cast` NULL on a non-NULL input), so one scan
  * yields both the clean stream (`quarantine_reasons` empty — cast and
  * proceed) and the quarantine stream (non-empty — route to the
  * dead-letter sink with provenance).
  *
  * Pure projection: try_cast is codegen'd, no UDF, no shuffle; the
  * split is two filters over the same tagged frame, which Spark
  * computes in one stage each off the shared scan. */
object Quarantine {

  /** Tag rows with cast-failure reasons for `specs` = (column, targetType). */
  def tagged(df: DataFrame, specs: Seq[(String, String)]): DataFrame = {
    require(specs.nonEmpty, "typedSplit needs at least one (column, type) spec")
    val reasons = array_compact(array(specs.map { case (c, t) =>
      when(col(c).isNotNull && expr(s"try_cast(`$c` AS $t)").isNull,
        lit(s"$c!$t")).otherwise(lit(null).cast("string"))
    }: _*))
    df.withColumn("quarantine_reasons", reasons)
  }

  /** Clean rows with the casts APPLIED (the declared schema holds). */
  def clean(df: DataFrame, specs: Seq[(String, String)]): DataFrame =
    tagged(df, specs).filter(size(col("quarantine_reasons")) === 0)
      .drop("quarantine_reasons")
      .select(df.columns.map { c =>
        specs.collectFirst { case (`c`, t) =>
          expr(s"try_cast(`$c` AS $t)").as(c) }
          .getOrElse(col(c))
      }: _*)

  /** Rows failing at least one declared cast, with reasons. */
  def quarantined(df: DataFrame, specs: Seq[(String, String)]): DataFrame =
    tagged(df, specs).filter(size(col("quarantine_reasons")) > 0)
}
