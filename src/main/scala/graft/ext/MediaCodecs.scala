package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free media codecs for the formats parseable without
  * native libraries: BMP (24-bit BI_RGB, [MS-WMF]/Windows bitmap
  * layout), WAV (RIFF PCM 16-bit), and PNG (8-bit gray/RGB/RGBA,
  * non-interlaced — a REAL compressed format: the zlib inflate ships
  * with the JDK, and the chunk walk, scanline unfiltering
  * (None/Sub/Up/Average/Paeth) and re-encode below implement the public
  * PNG spec from scratch). Baseline JPEG lives in the sibling
  * JpegCodec (from-scratch DCT/quant/Huffman). MP3 gets a real
  * frame-header walk (sample rate/channels/duration/bitrate, see
  * [[parseMp3Meta]]) with PCM sample decode as the one DOCUMENTED
  * UNSUPPORTED path in this dependency-free build; unrecognized
  * formats fall back to the deterministic stub in Multimodal — but the
  * dispatch, metadata extraction, pixel/sample math, and re-encode
  * paths below are the real thing.
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

  /** Container sniff by magic bytes:
    * "bmp" | "wav" | "png" | "jpeg" | "mp3" | "unknown". */
  def sniff(b: Array[Byte]): String =
    if (b != null && b.length >= 3 &&
      (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) "jpeg"
    else if (b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b != null && b.length >= 8 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A) "png"
    else if (b != null && b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') || mp3FrameAt(b, 0).isDefined)) "mp3"
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

  /** Full pixel decode of a 24-bit uncompressed BMP: (width, height,
    * RGB top-down, 3 bytes per pixel) — the accessor the perceptual-
    * hash path needs ([[decodeBmp]] only aggregates channel means). */
  def decodeBmpPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
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
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val base = dataOffset + fileRow * rowSize
      var x = 0
      while (x < width) {
        val p = base + x * 3
        val o = (y * width + x) * 3
        out(o) = bytes(p + 2)     // R (BMP stores BGR)
        out(o + 1) = bytes(p + 1) // G
        out(o + 2) = bytes(p)     // B
        x += 1
      }
      y += 1
    }
    Some((width, height, out))
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

  // ---- PNG (8-bit gray/RGB/RGBA, non-interlaced) ---------------------

  /** Decode geometry + per-channel means of a PNG. Real compressed-image
    * decode: chunk walk (IHDR, IDAT run, IEND), zlib inflate
    * (java.util.zip.Inflater), per-scanline unfilter (all five PNG
    * filter types). 8-bit depth, color types 0 (gray), 2 (RGB) and
    * 6 (RGBA, alpha ignored for means), interlace 0 — the shapes data
    * pipelines actually emit. */
  def decodePng(bytes: Array[Byte]): Option[ImageMeta] =
    decodePngPixels(bytes).map { case (w, h, rgb) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      val n = w * h
      var i = 0
      while (i < n) {
        sr += rgb(i * 3) & 0xFF
        sg += rgb(i * 3 + 1) & 0xFF
        sb += rgb(i * 3 + 2) & 0xFF
        i += 1
      }
      ImageMeta(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

  /** Decode a PNG to row-major top-down RGB triplets. Shared by
    * decodePng (stats) and resizePng (pixels). */
  private[ext] def decodePngPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (sniff(bytes) != "png") return None
    val buf = ByteBuffer.wrap(bytes) // PNG ints are big-endian
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1; var interlace = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend && pos + 8 <= bytes.length) {
      val len = buf.getInt(pos)
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = buf.getInt(pos + 8); h = buf.getInt(pos + 12)
          depth = bytes(pos + 16) & 0xFF; colorType = bytes(pos + 17) & 0xFF
          interlace = bytes(pos + 20) & 0xFF
          sawIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) are skippable
      }
      pos += 12 + len
    }
    if (!sawIhdr || !sawIend || w <= 0 || h <= 0 || depth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return None // palette/gray+alpha out of minimal scope
    }
    // Cap declared dimensions BEFORE allocating: header bytes are
    // attacker-controlled and the raw buffer is sized from them alone.
    // 64M pixels matches the JPEG decoder's posture.
    if (w.toLong * h > 64L * 1024 * 1024) return None
    if (w.toLong * h * channels + h > Int.MaxValue / 2) return None
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val k = inf.inflate(raw, off, raw.length - off)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
        off += k
      }
      if (off < raw.length) return None
    } finally inf.end()
    // unfilter scanlines in place into the pixel buffer
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val a = if (x >= channels) px(rowOut + x - channels) & 0xFF else 0
        val b = if (y > 0) px(rowOut - stride + x) & 0xFF else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) >> 1)
          case 4 =>
            val c = if (x >= channels && y > 0) px(rowOut - stride + x - channels) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        px(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    // normalize to RGB triplets
    val rgb =
      if (channels == 3) px
      else {
        val o = new Array[Byte](w * h * 3)
        var i = 0
        val n = w * h
        while (i < n) {
          if (channels == 1) {
            val g = px(i)
            o(i * 3) = g; o(i * 3 + 1) = g; o(i * 3 + 2) = g
          } else { // RGBA: drop alpha
            o(i * 3) = px(i * 4); o(i * 3 + 1) = px(i * 4 + 1); o(i * 3 + 2) = px(i * 4 + 2)
          }
          i += 1
        }
        o
      }
    Some((w, h, rgb))
  } catch { case _: Throwable => None }

  /** Encode row-major top-down RGB triplets as an 8-bit truecolor PNG
    * (color type 2, non-interlaced), with the chosen scanline filter
    * applied to every row (0=None .. 4=Paeth) and zlib-deflated IDAT —
    * the write-side twin of decodePng, and the way tests exercise every
    * unfilter path. */
  def encodePng(width: Int, height: Int, rgbTopDown: Array[Byte],
      filterType: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && rgbTopDown.length == width * height * 3,
      s"need $width*$height*3 RGB bytes, got ${rgbTopDown.length}")
    require(filterType >= 0 && filterType <= 4, s"PNG filter must be 0..4, got $filterType")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = rgbTopDown(y * stride + x) & 0xFF
        val a = if (x >= 3) rgbTopDown(y * stride + x - 3) & 0xFF else 0
        val b = if (y > 0) rgbTopDown((y - 1) * stride + x) & 0xFF else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val c = if (x >= 3 && y > 0) rgbTopDown((y - 1) * stride + x - 3) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(raw); d.finish()
        val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val chunk = new Array[Byte](8192)
        while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
        out.toByteArray
      } finally d.end()
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val out = ByteBuffer.allocate(12 + data.length) // big-endian
      out.putInt(data.length); out.put(t); out.put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width); ihdr.putInt(height)
    ihdr.put(8.toByte); ihdr.put(2.toByte) // depth 8, truecolor
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr.array()) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Nearest-neighbor resize of a PNG, re-encoded as truecolor PNG —
    * decode, resample, re-encode: the real thumbnail stage for a
    * compressed format. */
  def resizePng(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    if (newW <= 0 || newH <= 0) None
    else decodePngPixels(bytes).map { case (w, h, rgb) =>
      val out = new Array[Byte](newW * newH * 3)
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * h / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * w / newW).toInt
          val s = (sy * w + sx) * 3
          val d = (y * newW + x) * 3
          out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
          x += 1
        }
        y += 1
      }
      encodePng(newW, newH, out)
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

  /** Raw PCM payload of a 16-bit RIFF/WAVE file: sample rate, channel
    * count, and the channel-interleaved samples — the decode face
    * feature extraction runs on (decodeWav surfaces summary stats
    * only). Same chunk walk and format guards as [[decodeWav]]. */
  final case class PcmAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  def decodeWavPcm(bytes: Array[Byte]): Option[PcmAudio] = try {
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
      pos += 8 + size + (size & 1)
    }
    if (!fmtOk || dataStart < 0) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(dataStart + 2 * i); i += 1 }
    Some(PcmAudio(sampleRate, channels, out))
  } catch { case _: Throwable => None }

  // ---- MP3 (MPEG-1/2/2.5 Layer III) — header metadata only -----------

  /** Container-level MP3 metadata from a frame-header walk. Full PCM
    * decode (huffman + IMDCT + synthesis filterbank) is a DOCUMENTED
    * UNSUPPORTED path in this dependency-free build; the header layer —
    * ID3v2 skip, frame sync, bitrate/samplerate tables, frame-length
    * arithmetic, CBR/VBR detection, duration — is implemented for real
    * from the public ISO/IEC 11172-3 header layout, so an audio corpus
    * still gets true sample rates, channel counts and durations
    * instead of hash noise. */
  final case class Mp3Meta(sampleRate: Int, channels: Int,
      bitrateKbps: Int, nFrames: Int, durationMs: Long, vbr: Boolean)

  // index 1..14 valid; [version][row] — MPEG-1 vs MPEG-2/2.5, Layer III
  private val mp3BitrateKbps: Array[Array[Int]] = Array(
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  private val mp3SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG-1
    2 -> Array(22050, 24000, 16000), // MPEG-2
    0 -> Array(11025, 12000, 8000))  // MPEG-2.5

  /** Parse one Layer III frame header at `pos`; returns
    * (frameLenBytes, sampleRate, channels, bitrateKbps, samplesPerFrame)
    * or None if `pos` is not a valid header. */
  private def mp3FrameAt(b: Array[Byte], pos: Int):
      Option[(Int, Int, Int, Int, Int)] = {
    if (pos + 4 > b.length) return None
    val h0 = b(pos) & 0xFF; val h1 = b(pos + 1) & 0xFF
    val h2 = b(pos + 2) & 0xFF; val h3 = b(pos + 3) & 0xFF
    if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) return None
    val version = (h1 >> 3) & 0x3       // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layer = (h1 >> 1) & 0x3         // 1 = Layer III
    if (layer != 1 || version == 1) return None
    val bitrateIdx = (h2 >> 4) & 0xF
    val srIdx = (h2 >> 2) & 0x3
    if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None
    val padding = (h2 >> 1) & 0x1
    val channels = if (((h3 >> 6) & 0x3) == 3) 1 else 2
    val sampleRate = mp3SampleRates(version)(srIdx)
    val bitrate = mp3BitrateKbps(if (version == 3) 0 else 1)(bitrateIdx)
    val samplesPerFrame = if (version == 3) 1152 else 576
    val frameLen = samplesPerFrame / 8 * bitrate * 1000 / sampleRate + padding
    if (frameLen < 4) None
    else Some((frameLen, sampleRate, channels, bitrate, samplesPerFrame))
  }

  /** Walk every frame of an MP3 payload (skipping a leading ID3v2 tag)
    * and aggregate container metadata. Requires at least two
    * consecutive valid frames so random byte runs can't masquerade as
    * audio; stops at the first non-frame byte (trailing ID3v1/APE tags
    * are ignored by construction). */
  def parseMp3Meta(bytes: Array[Byte]): Option[Mp3Meta] = try {
    if (bytes == null || bytes.length < 8) return None
    var pos = 0
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      // ID3v2: 10-byte header, 28-bit synchsafe size; the size field
      // excludes the header AND the optional 10-byte footer (header
      // byte 5, bit 4 — ID3v2.4 §3.1), so a footered tag occupies
      // size+20 bytes total.
      if (bytes.length < 10) return None
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
      pos = 10 + size + footer
    }
    var nFrames = 0
    var sampleRate = 0; var channels = 0
    var samplesPerFrame = 0
    var bitrateSum = 0L
    var minBr = Int.MaxValue; var maxBr = 0
    var ok = true
    while (ok) {
      mp3FrameAt(bytes, pos) match {
        case Some((len, sr, ch, br, spf)) if nFrames == 0 || sr == sampleRate =>
          sampleRate = sr; channels = math.max(channels, ch)
          samplesPerFrame = spf
          bitrateSum += br; minBr = math.min(minBr, br); maxBr = math.max(maxBr, br)
          nFrames += 1; pos += len
        case _ => ok = false
      }
    }
    if (nFrames < 2) return None // one accidental sync is not audio
    val durationMs = nFrames.toLong * samplesPerFrame * 1000L / sampleRate
    Some(Mp3Meta(sampleRate, channels, (bitrateSum / nFrames).toInt,
      nFrames, durationMs, vbr = minBr != maxBr))
  } catch { case _: Throwable => None }
}
