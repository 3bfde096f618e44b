import org.apache.spark.sql.SparkSession
object Prof4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-20s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (i <- 1 to 6)
      time(s"dedup_exact_$i")(graft.SparkEntry.queries("dedup_exact")(spark, dir).count())
    for (i <- 1 to 3)
      time(s"q5_$i")(graft.SparkEntry.queries("q5_revenue_by_nation")(spark, dir).count())
    spark.stop()
  }
}
