package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class AviCodecSpec extends AnyFunSuite {

  private def frame(n: Int): Array[Byte] = Array.fill(n)(0x5A.toByte)

  test("round trip: frames and avih metadata survive the container") {
    val frames = Seq(frame(10), frame(21), frame(8)) // odd size forces padding
    val avi = AviCodec.encodeAviMjpeg(320, 240, 33333, frames)
    val (meta, got) = AviCodec.decodeAvi(avi).get
    assert(meta === AviCodec.VideoMeta(320, 240, 33333, 3))
    assert(got.length === 3)
    got.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("word alignment: odd-sized frames keep later chunks parseable") {
    val frames = (1 to 6).map(frame(_)) // 1,3,5 bytes are odd-sized
    val (_, got) = AviCodec.decodeAvi(
      AviCodec.encodeAviMjpeg(8, 8, 1000, frames)).get
    assert(got.map(_.length) === Vector(1, 2, 3, 4, 5, 6))
  }

  test("sampleFrames picks exactly the stride-indexed frames") {
    val frames = (0 until 7).map(i => Array(i.toByte))
    val avi = AviCodec.encodeAviMjpeg(8, 8, 1000, frames)
    val (_, sampled) = AviCodec.sampleFrames(avi, every = 3).get
    assert(sampled.map(_._1) === Vector(0, 3, 6))
    assert(sampled.map(_._2.head.toInt) === Vector(0, 3, 6))
    intercept[IllegalArgumentException](AviCodec.sampleFrames(avi, 0))
  }

  test("real MJPEG payload: sampled frames decode to their encoded gray") {
    val grays = Seq(10, 200, 77, 130)
    val frames = grays.map(g => JpegCodec.encodeJpegGray(8, 8,
      Array.fill(64)(g.toByte), JpegCodec.UnitQuant))
    val avi = AviCodec.encodeAviMjpeg(8, 8, 40000, frames)
    val (meta, sampled) = AviCodec.sampleFrames(avi, every = 2).get
    assert(meta.nFrames === 4 && sampled.map(_._1) === Vector(0, 2))
    val means = sampled.map { case (_, f) => JpegCodec.decodeJpeg(f).get.meanR }
    assert(means === Vector(10.0, 77.0))
  }

  test("fail-soft: garbage, truncation, and wrong containers yield None") {
    assert(AviCodec.decodeAvi(Array.empty[Byte]).isEmpty)
    assert(AviCodec.decodeAvi("not an avi at all".getBytes).isEmpty)
    val good = AviCodec.encodeAviMjpeg(8, 8, 1000, Seq(frame(32)))
    assert(AviCodec.decodeAvi(good.take(good.length - 9)).isEmpty)
    // a valid RIFF that is a WAV, not an AVI
    val wav = MediaCodecs.encodeWav16(8000, 1, Array[Short](1, -1))
    assert(AviCodec.decodeAvi(wav).isEmpty)
  }

  test("writer validates its inputs loudly") {
    intercept[IllegalArgumentException](
      AviCodec.encodeAviMjpeg(0, 8, 1000, Seq(frame(4))))
    intercept[IllegalArgumentException](
      AviCodec.encodeAviMjpeg(8, 8, 1000, Seq.empty))
  }
}
