package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-dispatching loader with the reference's `smart_load` semantics
  * (reference: main.py:69-94): extension (or explicit override) picks the
  * reader; unknown extensions fall back to delimiter sniffing.
  *
  * All readers return a lazy scan — schema inference reads a sample, but
  * no data materializes on the driver, so the same call shape works for a
  * 100 TB directory of part-files as for one local file. Filters/projections
  * applied downstream push into these scans (CSV/JSON/Parquet are all DSv2
  * pushdown-capable sources).
  */
object SmartLoad {

  final case class UnsupportedFormatException(filename: String)
      extends RuntimeException(s"Unsupported file type: $filename")

  /** Load `path` into a DataFrame, dispatching on file extension or
    * `formatOverride` ("csv" | "pipe" | "excel" | "json" | "parquet"). */
  def load(spark: SparkSession, path: String, formatOverride: Option[String] = None): DataFrame = {
    val ext = path.split('.').lastOption.map(_.toLowerCase).getOrElse("")
    def is(e: String, o: String) = ext == e || formatOverride.contains(o)

    if (is("csv", "csv")) csv(spark, path, ",")
    else if (is("txt", "pipe")) csv(spark, path, "|")
    else if (ext == "xlsx" || formatOverride.contains("excel"))
      // first sheet, header row, inferred dtypes (main.py:80-81) via the
      // built-in OOXML reader (no Excel library ships in this build)
      XlsxReader.read(spark, path)
    else if (ext == "xls")
      // legacy BIFF format: no parser available offline — clear error,
      // mirroring the reference's unsupported-type path (main.py:90-93)
      throw UnsupportedFormatException(path)
    else if (is("json", "json"))
      // pandas read_json consumes one whole JSON document (array of records);
      // Spark defaults to NDJSON, so multiLine=true is required for fidelity
      // (SURVEY.md §2.1). NDJSON still parses under multiLine=false readers,
      // but the reference's shape is the single-document one.
      spark.read.option("multiLine", true).json(path)
    else if (is("parquet", "parquet")) spark.read.parquet(path)
    else sniffDelimited(spark, path)
  }

  private def csv(spark: SparkSession, path: String, sep: String): DataFrame =
    spark.read
      .option("header", true)
      .option("inferSchema", true)
      .option("sep", sep)
      .csv(path)

  /** Unknown extension: detect the delimiter from a driver-side sample of
    * the first lines (the distributed-safe analogue of the reference's
    * `pd.read_csv(sep=None, engine='python')` csv.Sniffer fallback,
    * main.py:87-88), then delegate to the CSV scan — so the actual read
    * stays fully distributed. */
  def sniffDelimited(spark: SparkSession, path: String): DataFrame = {
    val sample = spark.read.text(path).limit(20).collect().map(_.getString(0)).filter(_.nonEmpty)
    if (sample.isEmpty) throw UnsupportedFormatException(path)
    val candidates = Seq(',', '\t', ';', '|', ':')
    // Pick the delimiter that appears a consistent, nonzero number of times
    // per line (csv.Sniffer's core heuristic).
    val scored = candidates.map { d =>
      val counts = sample.map(_.count(_ == d))
      val consistent = counts.forall(_ == counts.head) && counts.head > 0
      (d, consistent, counts.head)
    }
    val best = scored.filter(_._2).sortBy(-_._3).headOption
      .orElse(scored.filter(_._3 > 0).sortBy(-_._3).headOption)
      .getOrElse(throw UnsupportedFormatException(path))
    csv(spark, path, best._1.toString)
  }
}
