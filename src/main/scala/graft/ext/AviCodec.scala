package graft.ext

import java.io.ByteArrayOutputStream

/** From-scratch AVI (RIFF) container support for the video modality:
  * write and read Motion-JPEG AVI files — the container walk a video
  * curation pipeline needs for frame sampling, built from the public
  * RIFF/AVI layout (Microsoft multimedia file formats: RIFF chunks,
  * `avih` main header, `strh`/`strf` stream headers, `movi` data list,
  * `idx1` index; MJPG frames are baseline JPEG, decoded by
  * [[JpegCodec]]).
  *
  * Like the other media codecs this runs inside `mapPartitions` (the
  * one place per-row imperative byte work belongs): at cluster scale
  * video bytes stay where they were read, only sampled-frame STATS
  * travel. The reader is fail-soft (`Option`) — a truncated or
  * non-AVI payload yields None, never a task-killing throw, so one
  * corrupt file cannot fail a 100 TB scan.
  */
object AviCodec {

  /** Container-level metadata from the `avih` main header. */
  final case class VideoMeta(width: Int, height: Int, usPerFrame: Int,
    nFrames: Int)

  // --- little-endian byte plumbing ---------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(fourcc(id)); out.write(le32(body.length)); out.write(body)
    if (body.length % 2 == 1) out.write(0) // RIFF chunks are word-aligned
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(kind) ++ body)

  // --- writer -------------------------------------------------------------

  /** Encode an MJPEG AVI: each frame is a complete baseline JPEG (e.g.
    * from [[JpegCodec.encodeJpegGray]]). Emits the standard
    * hdrl(avih + strl(strh vids/MJPG + strf BITMAPINFOHEADER)) + movi
    * (`00dc` compressed-video chunks) + idx1 keyframe index. */
  def encodeAviMjpeg(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0,
      s"bad dimensions/rate: ${width}x$height @ $usPerFrame us/frame")
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max

    val avih = {
      val b = new ByteArrayOutputStream()
      b.write(le32(usPerFrame))            // dwMicroSecPerFrame
      b.write(le32(maxFrame * 1000000 / math.max(usPerFrame, 1))) // bytes/sec
      b.write(le32(0))                     // dwPaddingGranularity
      b.write(le32(0x10))                  // AVIF_HASINDEX
      b.write(le32(frames.length))         // dwTotalFrames
      b.write(le32(0))                     // dwInitialFrames
      b.write(le32(1))                     // dwStreams
      b.write(le32(maxFrame))              // dwSuggestedBufferSize
      b.write(le32(width)); b.write(le32(height))
      (0 until 4).foreach(_ => b.write(le32(0))) // dwReserved
      chunk("avih", b.toByteArray)
    }
    val strh = {
      val b = new ByteArrayOutputStream()
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
      b.write(le32(0)); b.write(le16(0)); b.write(le16(0)) // flags, prio, lang
      b.write(le32(0))                     // dwInitialFrames
      b.write(le32(usPerFrame))            // dwScale
      b.write(le32(1000000))               // dwRate (rate/scale = fps)
      b.write(le32(0))                     // dwStart
      b.write(le32(frames.length))         // dwLength (in frames)
      b.write(le32(maxFrame))              // dwSuggestedBufferSize
      b.write(le32(-1))                    // dwQuality (default)
      b.write(le32(0))                     // dwSampleSize (0: varying)
      b.write(le16(0)); b.write(le16(0))   // rcFrame
      b.write(le16(width)); b.write(le16(height))
      chunk("strh", b.toByteArray)
    }
    val strf = {
      val b = new ByteArrayOutputStream()
      b.write(le32(40))                    // biSize
      b.write(le32(width)); b.write(le32(height))
      b.write(le16(1)); b.write(le16(24))  // planes, bitcount
      b.write(fourcc("MJPG"))              // biCompression
      b.write(le32(width * height * 3))    // biSizeImage
      b.write(le32(0)); b.write(le32(0))   // ppm
      b.write(le32(0)); b.write(le32(0))   // clrUsed/Important
      chunk("strf", b.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviBody = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      // idx1 offsets are relative to the 'movi' fourcc position
      val off = 4 + moviBody.size()
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idxBody = new ByteArrayOutputStream()
    frames.zip(offsets).foreach { case (f, off) =>
      idxBody.write(fourcc("00dc"))
      idxBody.write(le32(0x10))            // AVIIF_KEYFRAME
      idxBody.write(le32(off)); idxBody.write(le32(f.length))
    }
    val idx1 = chunk("idx1", idxBody.toByteArray)

    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  // --- reader -------------------------------------------------------------

  private def rd32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)

  private def fcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Parse an AVI: `avih` metadata plus the `00dc`/`00db` video frame
    * payloads in stream order (the `movi` walk — the idx1 index is
    * redundant for a sequential scan and ignored). None on anything
    * malformed or non-AVI. */
  def decodeAvi(bytes: Array[Byte]): Option[(VideoMeta, Vector[Array[Byte]])] = try {
    if (bytes.length < 12 || fcc(bytes, 0) != "RIFF" ||
        fcc(bytes, 8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + rd32(bytes, 4)).toInt
    var meta: Option[VideoMeta] = None
    val frames = Vector.newBuilder[Array[Byte]]

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fcc(bytes, p)
        val sz = rd32(bytes, p + 4)
        if (sz < 0 || p + 8 + sz > to) throw new IllegalArgumentException("truncated chunk")
        if (id == "LIST") {
          val kind = fcc(bytes, p + 8)
          walk(p + 12, p + 8 + sz, inMovi || kind == "movi")
        } else if (id == "avih") {
          if (sz < 40) throw new IllegalArgumentException("short avih")
          meta = Some(VideoMeta(
            width = rd32(bytes, p + 8 + 32), height = rd32(bytes, p + 8 + 36),
            usPerFrame = rd32(bytes, p + 8), nFrames = rd32(bytes, p + 8 + 16)))
        } else if (inMovi && (id == "00dc" || id == "00db")) {
          frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)
        }
        p += 8 + sz + (sz % 2) // word alignment
      }
    }
    walk(12, riffEnd, inMovi = false)
    meta.filter(m => m.width > 0 && m.height > 0).map((_, frames.result()))
  } catch { case _: Exception => None }

  /** Every `every`-th frame (0, every, 2·every, …) with its index — the
    * frame-sampling primitive a video featurizer runs before decoding:
    * sampling happens on container offsets, so unsampled frames are
    * never JPEG-decoded. */
  def sampleFrames(bytes: Array[Byte],
      every: Int): Option[(VideoMeta, Vector[(Int, Array[Byte])])] = {
    require(every > 0, s"sampling stride must be positive, got $every")
    decodeAvi(bytes).map { case (meta, frames) =>
      (meta, frames.zipWithIndex.collect {
        case (f, i) if i % every == 0 => (i, f)
      })
    }
  }
}
