package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real and tested — schema, encoders,
  * partitioning, batch iteration. BMP, WAV, PNG and baseline JPEG
  * payloads decode with REAL codecs (MediaCodecs/JpegCodec, zero
  * dependencies); MP3 gets real container metadata from a frame-header
  * walk while its PCM decode is the one documented-unsupported path;
  * unrecognized formats fall back to a deterministic fake: `fakeDecode`
  * derives pseudo-features from a rolling hash of the payload bytes,
  * so outputs are stable across runs/machines and the pipeline remains
  * verifiable end-to-end.
  *
  * Scale notes: `mapPartitions` + an internal batch size is exactly the
  * shape a real decoder wants (amortize model/codec init per batch, not
  * per row); binary payloads never shuffle unless an op requires it —
  * feature extraction is narrow.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      mime: String,
      width: Int, // 0 when N/A
      height: Int,
      duration_ms: Long, // 0 for stills
      content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      content: Array[Byte])

  /** Payload decode with REAL codecs where the format allows it
    * (MediaCodecs: BMP 24-bit, WAV PCM-16, PNG 8-bit — PNG via the
    * JDK's zlib — and baseline JPEG via the from-scratch JpegCodec);
    * MP3 yields real header-walk metadata (tag 5.0) with PCM decode
    * documented unsupported; anything else falls back to the
    * deterministic stub. The leading feature is a format tag so
    * downstream consumers can tell real decodes from fallback hashes. */
  private[ext] def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    def fill(vals: Seq[Double]): Array[Float] = {
      vals.take(dim).zipWithIndex.foreach { case (v, i) => out(i) = v.toFloat }
      out
    }
    MediaCodecs.sniff(bytes) match {
      case "bmp" =>
        MediaCodecs.decodeBmp(bytes) match {
          case Some(m) => fill(Seq(1.0, m.width, m.height,
            m.meanR / 255.0, m.meanG / 255.0, m.meanB / 255.0,
            m.width.toDouble / math.max(m.height, 1)))
          case None => fakeDecode(bytes, dim)
        }
      case "wav" =>
        MediaCodecs.decodeWav(bytes) match {
          case Some(a) => fill(Seq(2.0, a.sampleRate / 1000.0, a.channels,
            a.nFrames, a.rms, a.zeroCrossRate,
            a.nFrames.toDouble / math.max(a.sampleRate, 1)))
          case None => fakeDecode(bytes, dim)
        }
      case "png" =>
        MediaCodecs.decodePng(bytes) match {
          case Some(m) => fill(Seq(3.0, m.width, m.height,
            m.meanR / 255.0, m.meanG / 255.0, m.meanB / 255.0,
            m.width.toDouble / math.max(m.height, 1)))
          case None => fakeDecode(bytes, dim)
        }
      case "jpeg" =>
        JpegCodec.decodeJpeg(bytes) match {
          case Some(m) => fill(Seq(4.0, m.width, m.height,
            m.meanR / 255.0, m.meanG / 255.0, m.meanB / 255.0,
            m.width.toDouble / math.max(m.height, 1)))
          case None => fakeDecode(bytes, dim)
        }
      case "mp3" =>
        // REAL container metadata (frame-header walk: sample rate,
        // channels, frame count, duration, mean bitrate); PCM sample
        // decode is the documented unsupported path in this
        // dependency-free build, so signal stats (rms/zcr) are absent
        // rather than faked
        MediaCodecs.parseMp3Meta(bytes) match {
          case Some(m) => fill(Seq(5.0, m.sampleRate / 1000.0, m.channels,
            m.nFrames, m.durationMs / 1000.0, m.bitrateKbps,
            if (m.vbr) 1.0 else 0.0))
          case None => fakeDecode(bytes, dim)
        }
      case _ => fakeDecode(bytes, dim)
    }
  }

  /** Deterministic stand-in for a real decoder of formats that need
    * codec libraries this build doesn't ship: fold the payload into
    * `dim` float features via a polynomial byte hash. REPLACE with a real
    * codec (JNI/ONNX/etc.) in production — signature and batch shape stay
    * the same. */
  private[ext] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % dim) += ((h >>> 33) % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** 64-bit perceptual difference hash (dHash — the public
    * gradient-hash construction for near-duplicate image detection):
    * grayscale the RGB frame (integer (r+g+b)/3), block-average down
    * to a 9×8 grid (integer means over the pixel blocks; a 9×8 input
    * passes through untouched, which is what the oracle-checked driver
    * row exploits), then bit (y·8+x) = gray(x,y) > gray(x+1,y).
    * Returned as two NON-NEGATIVE 32-bit words (hi = bits 32..63,
    * lo = 0..31) so the value is sign-free in every engine. A one-
    * pixel edit moves at most a handful of gradient bits — Hamming
    * distance over the 64 bits is the near-dup metric
    * ([[Dedup.dhashPairs]] buckets it exactly). */
  def dHash(width: Int, height: Int, rgbTopDown: Array[Byte]): (Long, Long) = {
    require(width >= 9 && height >= 8, s"dHash needs >= 9x8 input, got ${width}x$height")
    // integer grayscale
    val gray = new Array[Int](width * height)
    var i = 0
    while (i < gray.length) {
      val o = i * 3
      gray(i) = ((rgbTopDown(o) & 0xFF) + (rgbTopDown(o + 1) & 0xFF) +
        (rgbTopDown(o + 2) & 0xFF)) / 3
      i += 1
    }
    // block-mean downsample to 9x8 (floor boundaries, floor mean)
    val cell = new Array[Int](9 * 8)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * height / 8; val y1 = (cy + 1) * height / 8
      var cx = 0
      while (cx < 9) {
        val x0 = cx * width / 9; val x1 = (cx + 1) * width / 9
        var s = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * width + x); n += 1; x += 1 }
          y += 1
        }
        cell(cy * 9 + cx) = (s / n).toInt
        cx += 1
      }
      cy += 1
    }
    var hi = 0L; var lo = 0L
    var yy = 0
    while (yy < 8) {
      var x = 0
      while (x < 8) {
        if (cell(yy * 9 + x) > cell(yy * 9 + x + 1)) {
          val k = yy * 8 + x
          if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
        }
        x += 1
      }
      yy += 1
    }
    (hi, lo)
  }

  /** Batched per-partition feature extraction. `batchSize` models the
    * unit a real decoder/model would consume (e.g. a GPU batch). */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a GPU/model decoder would consume `batch` whole; the per-item
        // dispatch below uses real codecs for BMP/WAV, stub otherwise
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
            decodeFeatures(m.content, dim))
        }
      }
    }
  }

  /** Resize: REAL nearest-neighbor pixel resampling + re-encode for BMP
    * and PNG payloads (MediaCodecs.resizeBmp/resizePng); other image
    * formats update metadata only (their pixel codecs aren't in this
    * build). Narrow op — payloads transform in place on their
    * executors. */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map { m =>
      if (m.kind != "image") m
      else MediaCodecs.resizeBmp(m.content, w, h)
        .orElse(MediaCodecs.resizePng(m.content, w, h)) match {
        case Some(resized) => m.copy(width = w, height = h, content = resized)
        case None => m.copy(width = w, height = h)
      }
    }
  }

  /** Frame sampling stub for video rows: emits `n` evenly-spaced frames
    * (flatMap — row explosion stays on the executor that holds the
    * payload; no shuffle). Frame payload is a deterministic slice. */
  def sampleFrames(items: Dataset[MediaItem], n: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      val dur = math.max(m.duration_ms, 1L)
      (0 until n).map { i =>
        val ts = dur * i / n
        val from = if (m.content.isEmpty) 0 else ((m.content.length.toLong * i) / n).toInt
        val len = math.min(64, m.content.length - from)
        Frame(m.media_id, i, ts, m.content.slice(from, from + len))
      }
    }
  }

  /** Attach fake-decoded embedding features to any DataFrame carrying a
    * binary column — the DataFrame-level face of extractFeatures for
    * mixed relational/multimodal pipelines. Dataset.mapPartitions with a
    * row encoder (NOT a df.rdd round trip): the plan stays a single
    * narrow map stage — no ExistingRDD scan barrier, no schema
    * re-assembly, one serialize/deserialize boundary that a real
    * batch-decoding codec needs anyway. Null payloads yield null
    * features (left-join-shaped inputs survive). */
  /** Audio signal features over a decoded PCM samples column
    * (array<int>, one element per 16-bit sample) — the exact-integer
    * stats a speech/audio curation pipeline gates on: total energy
    * (Σs², loudness proxy), mean-absolute level, peak amplitude,
    * strict zero-crossing count (s_i·s_{i+1} < 0 — pitch/noisiness
    * proxy), and near-silence sample count (|s| < silenceAbs — the
    * dead-air trim signal). Every stat is integer arithmetic over the
    * samples array via codegen'd higher-order functions (aggregate /
    * zip_with / transform) — no UDF, no float, so an independent
    * engine replays them bit-for-bit from the same PCM. Zero shuffle:
    * a pure projection that runs at scan speed next to the decode
    * stage ([[MediaCodecs.decodeWavPcm]] feeds this from real WAV
    * payloads). */
  def audioFeatures(df: DataFrame, samplesCol: String): DataFrame = {
    val s = col(samplesCol)
    val n = size(s)
    def sumL(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0L), (acc, x) => acc + x)
    df.withColumn("n_samples", n.cast("long"))
      .withColumn("energy", sumL(transform(s, x => x.cast("long") * x)))
      .withColumn("sum_abs", sumL(transform(s, x => abs(x).cast("long"))))
      .withColumn("peak",
        when(n > 0, array_max(transform(s, x => abs(x))).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("zero_crossings",
        when(n > 1, sumL(zip_with(
          slice(s, lit(1), n - 1), slice(s, lit(2), n - 1),
          (a, b) => when(a * b < 0, lit(1L)).otherwise(lit(0L)))))
          .otherwise(lit(0L)))
      .withColumn("silence_n",
        sumL(transform(s, x => when(abs(x) < 100, lit(1L)).otherwise(lit(0L)))))
  }

  def withContentFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add("content_features",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) null else decodeFeatures(bytes, dim).toSeq
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ feats)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
