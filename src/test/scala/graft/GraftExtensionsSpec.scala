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
