package graft.ext

/** From-scratch baseline JPEG (ITU-T T.81 / JFIF) encoder + decoder.
  * No libraries — the DCT, quantization, zigzag, canonical Huffman
  * coding, byte stuffing, restart markers, and the marker walk are all
  * implemented from the public spec, like the PNG codec next door.
  *
  * Scope (documented, fail-soft None outside it):
  *  - baseline sequential DCT (SOF0), 8-bit samples;
  *  - grayscale (1 component) and YCbCr 4:4:4 (3 components, no
  *    chroma subsampling). Subsampled scans return None;
  *  - DRI/RSTn restart markers supported on decode;
  *  - encoder emits one quant table + one DC and one AC Huffman table
  *    (standard Annex K luminance tables) shared by all components —
  *    legal JPEG, smallest self-consistent table set.
  *
  * Exactness: JPEG is lossy, but a grayscale image whose pixels are
  * CONSTANT within each 8x8 block, encoded with a unit (all-ones)
  * quantization table, round-trips bit-exactly: a constant block's DCT
  * is DC-only with an integral coefficient (DC = 8*(g-128)), every AC
  * is 0, and the IDCT reproduces the constant. multimodal_decode uses
  * exactly that family so DuckDB can predict decoded means from doc_id
  * arithmetic; the lossy AC path is pinned approximately (MAE bounds)
  * in MediaCodecsSpec.
  */
object JpegCodec {

  // ---- shared tables ------------------------------------------------------

  /** Zigzag index -> natural (row-major) index, T.81 Figure 5. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** All-ones quantization table: finest legal quantization — the basis
    * of the exact constant-block round trip. */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  /** Standard luminance quantization table (T.81 Annex K.1), natural
    * order. Visibly lossy; used by the spec's approximate round trip. */
  val StdQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // Annex K.3 luminance DC: code-length counts (lengths 1..16) + values
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // Annex K.3 luminance AC
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman code assignment (T.81 Annex C): value -> (code,
    * length), in BITS/HUFFVAL order. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  private lazy val DcEnc = buildEncodeTable(DcBits, DcVals)
  private lazy val AcEnc = buildEncodeTable(AcBits, AcVals)

  // ---- DCT ---------------------------------------------------------------

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  @inline private def c(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8x8 DCT-II (T.81 A.3.3), in: level-shifted samples. */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += in(x * 8 + y) * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            y += 1
          }
          x += 1
        }
        out(u * 8 + v) = 0.25 * c(u) * c(v) * s
        v += 1
      }
      u += 1
    }
  }

  /** Inverse 8x8 DCT (T.81 A.3.3). */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            s += c(u) * c(v) * in(u * 8 + v) * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            v += 1
          }
          u += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
  }

  // ---- bit IO with 0xFF stuffing -----------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing (T.81 F.1.2.3)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec convention). */
    def flush(): Unit = if (nbits > 0) { write(0xFF, 8 - nbits); () }
  }

  private final class BitReader(data: Array[Byte], private var pos: Int) {
    private var acc = 0
    private var nbits = 0
    private var eos = false
    def bytePos: Int = pos

    /** Next entropy byte, unstuffing 0xFF00; a real marker ends the scan. */
    private def nextByte(): Int = {
      if (eos || pos >= data.length) { eos = true; return 0 }
      val b = data(pos) & 0xFF
      if (b == 0xFF) {
        if (pos + 1 >= data.length) { eos = true; return 0 }
        val b2 = data(pos + 1) & 0xFF
        if (b2 == 0x00) { pos += 2; 0xFF }
        else { eos = true; 0 } // marker: stop feeding bits (EOI/RST handled above)
      } else { pos += 1; b }
    }
    def readBit(): Int = {
      if (nbits == 0) { acc = nextByte(); nbits = 8 }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker (T.81 F.2.1.3.1). */
    def consumeRestart(): Boolean = {
      nbits = 0
      while (pos + 1 < data.length && (data(pos) & 0xFF) != 0xFF) pos += 1 // tolerate pad
      if (pos + 1 >= data.length) return false
      val m = data(pos + 1) & 0xFF
      if (m >= 0xD0 && m <= 0xD7) { pos += 2; eos = false; true } else false
    }
  }

  // ---- decoder ------------------------------------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0, var pred: Int = 0)

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3 decode tables
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.readBit()
      var l = 1
      while (l < 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | r.readBit()
        l += 1
      }
      if (maxCode(l) < 0 || code > maxCode(l)) throw new IllegalArgumentException("bad huffman code")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** EXTEND (T.81 F.2.2.1): map magnitude bits to signed value. */
  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode to (width, height, nComps, planes) — planes(c) is a
    * width*height byte plane (Y or R,G,B after color conversion happens
    * in the caller; here components as coded). */
  private[ext] def decodeJpegPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] = try {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)

    while (pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xD9) return None // EOI before SOS
      val len = u16(pos + 2)
      val seg = pos + 4
      marker match {
        case 0xDB => // DQT: one or more tables
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xF0) >> 4
            val tq = bytes(p) & 0x0F
            val t = new Array[Int](64)
            var i = 0
            if (pq == 0) { while (i < 64) { t(ZigZag(i)) = bytes(p + 1 + i) & 0xFF; i += 1 }; p += 65 }
            else { while (i < 64) { t(ZigZag(i)) = u16(p + 1 + 2 * i); i += 1 }; p += 129 }
            quant(tq) = t
          }
        case 0xC4 => // DHT: one or more tables
          var p = seg
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xF0) >> 4
            val th = bytes(p) & 0x0F
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { bits(i) = bytes(p + i) & 0xFF; total += bits(i); i += 1 }
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = bytes(p + 17 + i) & 0xFF; i += 1 }
            val tab = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            p += 17 + total
          }
        case 0xC0 => // SOF0 baseline
          if ((bytes(seg) & 0xFF) != 8) return None // 8-bit precision only
          height = u16(seg + 1); width = u16(seg + 3)
          val n = bytes(seg + 5) & 0xFF
          if (width <= 0 || height <= 0 || (n != 1 && n != 3)) return None
          // Per-component planes are width*height bytes, allocated before
          // any entropy data is validated — a tiny crafted header
          // declaring e.g. 30000x30000x3 would demand ~2.7 GB on an
          // executor. Cap at 64M pixels (same posture as the PNG path).
          if (width.toLong * height.toLong > 64L * 1024 * 1024) return None
          comps = Array.tabulate(n) { i =>
            val o = seg + 6 + 3 * i
            Component(bytes(o) & 0xFF, (bytes(o + 1) & 0xF0) >> 4,
              bytes(o + 1) & 0x0F, bytes(o + 2) & 0xFF)
          }
          if (comps.exists(cp => cp.h != 1 || cp.v != 1)) return None // 4:4:4 / gray only
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
             0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF => return None // non-baseline
        case 0xDD => restartInterval = u16(seg)
        case 0xDA => // SOS: entropy-coded data follows
          if (comps == null) return None
          val ns = bytes(seg) & 0xFF
          if (ns != comps.length) return None
          var i = 0
          while (i < ns) {
            val cid = bytes(seg + 1 + 2 * i) & 0xFF
            val tabs = bytes(seg + 2 + 2 * i) & 0xFF
            val comp = comps.find(_.id == cid).getOrElse(return None)
            comp.dcTab = (tabs & 0xF0) >> 4
            comp.acTab = tabs & 0x0F
            i += 1
          }
          val r = new BitReader(bytes, pos + 2 + len)
          val bw = (width + 7) / 8
          val bh = (height + 7) / 8
          val planes = comps.map(_ => new Array[Byte](width * height))
          val coefZ = new Array[Int](64)
          val freq = new Array[Double](64)
          val pix = new Array[Double](64)
          var mcu = 0
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                if (!r.consumeRestart()) return None
                comps.foreach(_.pred = 0)
              }
              var ci = 0
              while (ci < comps.length) {
                val comp = comps(ci)
                val dcTab = dcTabs(comp.dcTab); val acTab = acTabs(comp.acTab)
                val qt = quant(comp.tq)
                if (dcTab == null || acTab == null || qt == null) return None
                java.util.Arrays.fill(coefZ, 0)
                val t = dcTab.decode(r)
                comp.pred += extend(r.readBits(t), t)
                coefZ(0) = comp.pred
                var k = 1
                while (k < 64) {
                  val rs = acTab.decode(r)
                  val run = (rs & 0xF0) >> 4
                  val size = rs & 0x0F
                  if (size == 0) {
                    if (run == 15) k += 16 // ZRL
                    else k = 64 // EOB
                  } else {
                    k += run
                    if (k > 63) throw new IllegalArgumentException("AC index overflow")
                    coefZ(k) = extend(r.readBits(size), size)
                    k += 1
                  }
                }
                var z = 0
                while (z < 64) {
                  val nat = ZigZag(z)
                  freq(nat) = coefZ(z).toDouble * qt(nat)
                  z += 1
                }
                idct(freq, pix)
                var yy = 0
                while (yy < 8) {
                  val py = by * 8 + yy
                  if (py < height) {
                    var xx = 0
                    while (xx < 8) {
                      val px = bx * 8 + xx
                      if (px < width) {
                        val v = math.round(pix(yy * 8 + xx) + 128.0).toInt
                        planes(ci)(py * width + px) =
                          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                      }
                      xx += 1
                    }
                  }
                  yy += 1
                }
                ci += 1
              }
              mcu += 1
              bx += 1
            }
            by += 1
          }
          return Some((width, height, planes))
        case _ => () // APPn / COM / others: skip
      }
      pos += 2 + len
    }
    None
  } catch { case _: Exception => None }

  /** Decode to image stats: grayscale means replicate across channels;
    * 3-component scans are YCbCr (JFIF) and convert to RGB. */
  def decodeJpeg(bytes: Array[Byte]): Option[MediaCodecs.ImageMeta] =
    decodeJpegPixels(bytes).map { case (w, h, planes) =>
      val n = w.toLong * h
      if (planes.length == 1) {
        var s = 0L
        var i = 0
        while (i < planes(0).length) { s += planes(0)(i) & 0xFF; i += 1 }
        val m = s.toDouble / n
        MediaCodecs.ImageMeta(w, h, m, m, m)
      } else {
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < n) {
          val y = (planes(0)(i) & 0xFF).toDouble
          val cb = (planes(1)(i) & 0xFF) - 128.0
          val cr = (planes(2)(i) & 0xFF) - 128.0
          sr += clamp255(math.round(y + 1.402 * cr).toInt)
          sg += clamp255(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
          sb += clamp255(math.round(y + 1.772 * cb).toInt)
          i += 1
        }
        MediaCodecs.ImageMeta(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }

  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- encoder ------------------------------------------------------------

  /** Magnitude category (number of bits) of a coefficient. */
  @inline private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode one component plane (level-shifted handled inside). Returns
    * the new DC predictor. */
  private def encodeBlock(bw: BitWriter, samples: Array[Double], pred: Int,
      quant: Array[Int]): Int = {
    val freq = new Array[Double](64)
    fdct(samples, freq)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) {
      // clamp to the Annex K table's max category (10 bits for AC, and
      // DC diffs then fit category 11): a worst-case synthetic block
      // under a unit quant table can exceed it; real content never does,
      // and the loss is bounded by the clamp
      val v = math.round(freq(i) / quant(i)).toInt
      q(i) = if (v > 1023) 1023 else if (v < -1023) -1023 else v
      i += 1
    }
    // DC: category + magnitude bits of the prediction difference
    val diff = q(0) - pred
    val t = category(diff)
    val (dcCode, dcLen) = DcEnc(t)
    bw.write(dcCode, dcLen)
    if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    // AC: (run, size) pairs in zigzag order with ZRL/EOB
    var run = 0
    var k = 1
    while (k < 64) {
      val v = q(ZigZag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { val (c0, l0) = AcEnc(0xF0); bw.write(c0, l0); run -= 16 }
        val size = category(v)
        val (c1, l1) = AcEnc((run << 4) | size)
        bw.write(c1, l1)
        bw.write(if (v < 0) v + (1 << size) - 1 else v, size)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c2, l2) = AcEnc(0x00); bw.write(c2, l2) } // EOB
    q(0)
  }

  private def writeHeaders(out: java.io.ByteArrayOutputStream, width: Int,
      height: Int, nComps: Int, quant: Array[Int]): Unit = {
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    out.write(0xFF); out.write(0xD8) // SOI
    // APP0 JFIF
    out.write(0xFF); out.write(0xE0); u16(16)
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1); out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    // DQT (table 0, 8-bit, zigzag order)
    out.write(0xFF); out.write(0xDB); u16(67); out.write(0)
    var i = 0
    while (i < 64) { out.write(quant(ZigZag(i)) & 0xFF); i += 1 }
    // SOF0
    out.write(0xFF); out.write(0xC0); u16(8 + 3 * nComps); out.write(8)
    u16(height); u16(width); out.write(nComps)
    var ci = 0
    while (ci < nComps) { out.write(ci + 1); out.write(0x11); out.write(0); ci += 1 }
    // DHT: DC table 0 + AC table 0
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      out.write(0xFF); out.write(0xC4); u16(19 + vals.length); out.write(tcTh)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(out.write)
    }
    dht(0x00, DcBits, DcVals)
    dht(0x10, AcBits, AcVals)
    // SOS
    out.write(0xFF); out.write(0xDA); u16(6 + 2 * nComps); out.write(nComps)
    ci = 0
    while (ci < nComps) { out.write(ci + 1); out.write(0x00); ci += 1 }
    out.write(0); out.write(63); out.write(0)
  }

  /** Encode an 8-multiple grayscale image (row-major bytes). */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Byte],
      quant: Array[Int] = StdQuant): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "encoder requires 8-multiple dims")
    require(gray.length == width * height, "plane size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, 1, quant)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    var pred = 0
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            block(yy * 8 + xx) = (gray((by * 8 + yy) * width + bx * 8 + xx) & 0xFF) - 128.0
            xx += 1
          }
          yy += 1
        }
        pred = encodeBlock(bw, block, pred, quant)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode an 8-multiple RGB image as YCbCr 4:4:4 (JFIF BT.601). */
  def encodeJpegRgb(width: Int, height: Int, rgbTopDown: Array[Byte],
      quant: Array[Int] = StdQuant): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "encoder requires 8-multiple dims")
    require(rgbTopDown.length == width * height * 3, "plane size mismatch")
    val n = width * height
    val planes = Array(new Array[Double](n), new Array[Double](n), new Array[Double](n))
    var i = 0
    while (i < n) {
      val r = rgbTopDown(3 * i) & 0xFF
      val g = rgbTopDown(3 * i + 1) & 0xFF
      val b = rgbTopDown(3 * i + 2) & 0xFF
      planes(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
      planes(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
      planes(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, 3, quant)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val preds = new Array[Int](3)
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        var ci = 0
        while (ci < 3) {
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              block(yy * 8 + xx) = planes(ci)((by * 8 + yy) * width + bx * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          preds(ci) = encodeBlock(bw, block, preds(ci), quant)
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
