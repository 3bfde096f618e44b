package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free media codecs for the uncompressed container
  * formats parseable without native libraries: BMP (24-bit BI_RGB,
  * [MS-WMF]/Windows bitmap layout) and WAV (RIFF PCM 16-bit). Compressed
  * formats (JPEG/PNG/MP3/...) still fall back to the deterministic stub
  * in Multimodal — decoding those needs codec libraries this build
  * doesn't ship — but the dispatch, metadata extraction, pixel/sample
  * math, and re-encode path below are the real thing.
  *
  * All functions are pure byte-array transforms: they run inside
  * `mapPartitions` on executors, payloads never touch the driver.
  * Malformed payloads return None (fail-soft per row — one corrupt file
  * must not kill a 100 TB scan).
  */
object MediaCodecs {

  final case class ImageMeta(width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  final case class AudioMeta(sampleRate: Int, channels: Int, nFrames: Long,
      rms: Double, zeroCrossRate: Double)

  /** Container sniff by magic bytes: "bmp" | "wav" | "unknown". */
  def sniff(b: Array[Byte]): String =
    if (b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  // ---- BMP (24-bit uncompressed) -------------------------------------

  /** Decode geometry + per-channel means of a 24-bit BI_RGB bitmap.
    * Handles bottom-up (positive height) and top-down (negative) rows
    * and 4-byte row padding. */
  def decodeBmp(bytes: Array[Byte]): Option[ImageMeta] = try {
    if (sniff(bytes) != "bmp" || bytes.length < 54) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xFFFF
    val compression = buf.getInt(30)
    if (width <= 0 || heightRaw == 0 || bpp != 24 || compression != 0) return None
    val height = math.abs(heightRaw)
    val topDown = heightRaw < 0
    val rowSize = ((24 * width + 31) / 32) * 4
    if (dataOffset.toLong + rowSize.toLong * height > bytes.length) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val base = dataOffset + fileRow * rowSize
      var x = 0
      while (x < width) {
        val p = base + x * 3
        sb += bytes(p) & 0xFF
        sg += bytes(p + 1) & 0xFF
        sr += bytes(p + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Some(ImageMeta(width, height, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  } catch { case _: Throwable => None }

  /** Nearest-neighbor resize of a 24-bit BMP, re-encoded as a minimal
    * 54-byte-header 24-bit BMP (bottom-up). Real pixel work — the image
    * twin of what a production thumbnail stage does, minus fancy
    * filtering. */
  def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = try {
    if (newW <= 0 || newH <= 0 || sniff(bytes) != "bmp") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xFFFF
    if (width <= 0 || heightRaw == 0 || bpp != 24 || buf.getInt(30) != 0) return None
    val height = math.abs(heightRaw)
    val topDown = heightRaw < 0
    val srcRow = ((24 * width + 31) / 32) * 4
    if (dataOffset.toLong + srcRow.toLong * height > bytes.length) return None

    val dstRow = ((24 * newW + 31) / 32) * 4
    val out = new Array[Byte](54 + dstRow * newH)
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    ob.put('B'.toByte); ob.put('M'.toByte)
    ob.putInt(2, out.length); ob.putInt(10, 54)
    ob.putInt(14, 40); ob.putInt(18, newW); ob.putInt(22, newH)
    ob.putShort(26, 1.toShort); ob.putShort(28, 24.toShort)
    ob.putInt(34, dstRow * newH)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * height / newH).toInt // logical row (0 = top)
      val srcFileRow = if (topDown) sy else height - 1 - sy
      val dstFileRow = newH - 1 - y // always write bottom-up
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * width / newW).toInt
        val sp = dataOffset + srcFileRow * srcRow + sx * 3
        val dp = 54 + dstFileRow * dstRow + x * 3
        out(dp) = bytes(sp); out(dp + 1) = bytes(sp + 1); out(dp + 2) = bytes(sp + 2)
        x += 1
      }
      y += 1
    }
    Some(out)
  } catch { case _: Throwable => None }

  /** Encode a 24-bit bottom-up BMP from row-major TOP-DOWN RGB triplets
    * (3 bytes per pixel). The write-side twin of decodeBmp — used by
    * synthetic-payload pipelines and tests. */
  def encodeBmp24(width: Int, height: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgbTopDown.length == width * height * 3,
      s"need $width*$height*3 RGB bytes, got ${rgbTopDown.length}")
    val rowSize = ((24 * width + 31) / 32) * 4
    val out = new Array[Byte](54 + rowSize * height)
    val b = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte); b.put('M'.toByte)
    b.putInt(2, out.length); b.putInt(10, 54)
    b.putInt(14, 40); b.putInt(18, width); b.putInt(22, height)
    b.putShort(26, 1.toShort); b.putShort(28, 24.toShort)
    b.putInt(34, rowSize * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        val d = 54 + (height - 1 - y) * rowSize + x * 3
        out(d) = rgbTopDown(s + 2) // B
        out(d + 1) = rgbTopDown(s + 1) // G
        out(d + 2) = rgbTopDown(s) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a mono/stereo PCM-16 RIFF/WAVE payload — the write-side twin
    * of decodeWav. Samples are frame-interleaved. */
  def encodeWav16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    val b = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(4, 36 + dataLen)
    b.position(8); b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")); b.putInt(16, 16)
    b.putShort(20, 1.toShort); b.putShort(22, channels.toShort)
    b.putInt(24, sampleRate); b.putInt(28, sampleRate * channels * 2)
    b.putShort(32, (channels * 2).toShort); b.putShort(34, 16.toShort)
    b.position(36); b.put("data".getBytes("US-ASCII")); b.putInt(40, dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(44 + i * 2, samples(i)); i += 1 }
    out
  }

  // ---- WAV (RIFF PCM 16-bit) -----------------------------------------

  /** Decode format + signal stats of a 16-bit PCM RIFF/WAVE payload:
    * sample rate, channels, frame count, RMS amplitude (over all
    * channels, normalized to [0,1]) and zero-crossing rate of channel 0.
    */
  def decodeWav(bytes: Array[Byte]): Option[AudioMeta] = try {
    if (sniff(bytes) != "wav") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var dataStart = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && (dataStart < 0 || !fmtOk)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          val audioFormat = buf.getShort(pos + 8) & 0xFFFF
          channels = buf.getShort(pos + 10) & 0xFFFF
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xFFFF
          fmtOk = audioFormat == 1 && bits == 16 && channels > 0 && sampleRate > 0
        case "data" =>
          dataStart = pos + 8; dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (!fmtOk || dataStart < 0) return None
    val bytesPerFrame = 2 * channels
    val nFrames = dataLen / bytesPerFrame
    if (nFrames == 0)
      return Some(AudioMeta(sampleRate, channels, 0L, 0.0, 0.0))
    var sumSq = 0.0
    var crossings = 0L
    var prevSign = 0
    var f = 0
    while (f < nFrames) {
      val base = dataStart + f * bytesPerFrame
      var c = 0
      while (c < channels) {
        val s = buf.getShort(base + 2 * c).toDouble / 32768.0
        sumSq += s * s
        c += 1
      }
      val s0 = buf.getShort(base).toInt
      val sign = if (s0 > 0) 1 else if (s0 < 0) -1 else prevSign
      if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
      if (sign != 0) prevSign = sign
      f += 1
    }
    val rms = math.sqrt(sumSq / (nFrames.toLong * channels))
    val zcr = if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0
    Some(AudioMeta(sampleRate, channels, nFrames.toLong, rms, zcr))
  } catch { case _: Throwable => None }
}
