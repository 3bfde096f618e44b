package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table access (see TESTDATA.md): one parquet per table under
  * the scale-factor directory the driver passes in. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
