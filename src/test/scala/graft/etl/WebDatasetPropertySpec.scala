package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Generative round-trip for the tar shard writer/reader: 15 seeded
  * random shard layouts — entry sizes clustered on the 512-byte block
  * edges, random binary content, NULL (omitted) entries, deep keys
  * crossing the 100-byte ustar name boundary into the prefix field,
  * multi-partition shard sets — must read back sample-exactly. GNU
  * tar co-validates every shard (`tar -tf` must succeed and list the
  * expected entry count), so the generator is checked against an
  * independent implementation, not just our own reader.
  */
class WebDatasetPropertySpec extends SparkTestBase {

  private val edgeSizes = Vector(0, 1, 100, 511, 512, 513, 1023, 1024, 1025)

  test("15 seeded random shard layouts round-trip; GNU tar lists each shard") {
    import scala.sys.process._
    (0 until 15).foreach { scenario =>
      val rnd = new scala.util.Random(scenario * 104729 + 7)
      val nExt = 1 + rnd.nextInt(3)
      val exts = (0 until nExt).map(i => if (i == 0) "txt" else s"x$i.bin")
      val nRows = 1 + rnd.nextInt(14)
      val rows = (0 until nRows).map { ri =>
        val key =
          if (rnd.nextInt(4) == 0) ("deep" + "d" * 40) + "/" + ("e" * 50) + s"/k$ri"
          else f"sample-$scenario%02d-$ri%04d"
        val parts = exts.map { _ =>
          if (rnd.nextInt(5) == 0) null
          else {
            val n = if (rnd.nextBoolean()) edgeSizes(rnd.nextInt(edgeSizes.length))
            else rnd.nextInt(2048)
            val b = new Array[Byte](n); rnd.nextBytes(b); b
          }
        }
        // at least one non-null part so the sample exists at all
        val anchored =
          if (parts.forall(_ == null)) parts.updated(0, Array[Byte](1)) else parts
        Row.fromSeq(key +: anchored)
      }
      val schema = StructType(
        StructField("key", StringType, nullable = false) +:
          exts.map(e => StructField(e, BinaryType, nullable = true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(3)), schema)
      val dir = java.nio.file.Files.createTempDirectory("wds_prop").toString + "/d"
      Sinks.webDatasetShards(df, "key", dir)

      val shards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
      val expectedEntries = rows.map(r => (1 until schema.length).count(!r.isNullAt(_))).sum
      val listed = shards.map(s => Seq("tar", "-tf", s.getAbsolutePath).!!.trim)
        .flatMap(out => if (out.isEmpty) Nil else out.split("\n").toSeq)
      assert(listed.length === expectedEntries, s"scenario $scenario GNU tar entry count")

      val back = WebDatasetIO.read(spark, dir, extensions = exts).collect()
      assert(back.length === nRows, s"scenario $scenario sample count")
      val gotByKey = back.map(r => r.getString(0) ->
        exts.indices.map(i => Option(r.getAs[Array[Byte]](i + 1)).map(_.toSeq)).toSeq).toMap
      rows.foreach { r =>
        val key = r.getString(0)
        val want = exts.indices.map(i =>
          Option(r.getAs[Array[Byte]](i + 1)).map(_.toSeq)).toSeq
        assert(gotByKey(key) === want, s"scenario $scenario sample $key diverged")
      }
    }
  }
}
