package graft

import graft.multimodal.Codecs
import graft.multimodal.Codecs.{Mp4Meta, Mp4Track}

import org.scalatest.funsuite.AnyFunSuite

class Mp4Spec extends AnyFunSuite {

  private val av = Mp4Meta("isom", Seq(
    Mp4Track("vide", "avc1", 90000L, 450000L, 1920, 1080, 125L),
    Mp4Track("soun", "mp4a", 48000L, 240000L, 0, 0, 469L)))

  test("encode -> decode round-trips the container metadata exactly") {
    val bytes = Codecs.encodeMp4Meta(av, Array.fill(64)(0x5a.toByte))
    val got = Codecs.decodeMp4Meta(bytes)
    assert(got == av)
  }

  test("payload rides mdat opaquely and does not perturb the metadata") {
    val p1 = Codecs.encodeMp4Meta(av, Array.emptyByteArray)
    val p2 = Codecs.encodeMp4Meta(av, Array.tabulate(1000)(_.toByte))
    assert(Codecs.decodeMp4Meta(p1) == Codecs.decodeMp4Meta(p2))
    assert(p2.length == p1.length + 1000)
  }

  test("largesize (64-bit) and size==0 (to-end) boxes parse") {
    val base = Codecs.encodeMp4Meta(av, Array.emptyByteArray)
    // rewrite the trailing mdat as a largesize box with 7 bytes payload
    def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val noMdat = base.dropRight(8)
    val large = noMdat ++ be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be32(0) ++ be32(16 + 7) ++ Array.fill(7)(1.toByte)
    assert(Codecs.decodeMp4Meta(large) == av)
    // a size==0 final box extends to the end of the file
    val zero = noMdat ++ be32(0) ++ "free".getBytes("US-ASCII") ++ Array.fill(5)(2.toByte)
    assert(Codecs.decodeMp4Meta(zero) == av)
  }

  test("unknown boxes are skipped; corruption fails fast") {
    val base = Codecs.encodeMp4Meta(av, Array.emptyByteArray)
    def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val withFree = be32(16) ++ "free".getBytes("US-ASCII") ++ Array.fill(8)(9.toByte) ++ base
    assert(Codecs.decodeMp4Meta(withFree) == av)
    // a box whose size runs past its container must throw, not wrap
    val corrupt = base.clone()
    corrupt(0) = 0x7f.toByte // ftyp size becomes enormous
    val e = intercept[IllegalArgumentException](Codecs.decodeMp4Meta(corrupt))
    assert(e.getMessage.contains("past its container"))
    // truncation mid-header throws
    intercept[IllegalArgumentException](Codecs.decodeMp4Meta(base.take(base.length - 3)))
    // a payload with no ftyp is rejected
    intercept[IllegalArgumentException](
      Codecs.decodeMp4Meta(be32(16) ++ "free".getBytes("US-ASCII") ++ Array.fill(8)(0.toByte)))
  }

  test("a video-only container reports zero-dimension audio fields absent") {
    val v = Mp4Meta("mp42", Seq(Mp4Track("vide", "vp09", 600L, 3600L, 640, 360, 30L)))
    val got = Codecs.decodeMp4Meta(Codecs.encodeMp4Meta(v, Array.emptyByteArray))
    assert(got == v)
  }
}
