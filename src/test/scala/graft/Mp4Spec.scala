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

  test("fuzz: garbage and single-byte mutations never escape as non-typed errors") {
    // deterministic LCG — no RNG state, reproducible failures
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    // pure garbage of every small length
    for (len <- 0 until 200) {
      val junk = Array.tabulate(len)(_ => (next() >>> 16).toByte)
      try { Codecs.decodeMp4Meta(junk); () }
      catch { case _: IllegalArgumentException => () } // the ONLY permitted escape
    }
    // every single-byte corruption of a real container
    val base = Codecs.encodeMp4Meta(av, Array.fill(16)(0x33.toByte))
    for (i <- base.indices; delta <- Seq(1, 0x80)) {
      val mut = base.clone()
      mut(i) = (mut(i) + delta).toByte
      try { Codecs.decodeMp4Meta(mut); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("a video-only container reports zero-dimension audio fields absent") {
    val v = Mp4Meta("mp42", Seq(Mp4Track("vide", "vp09", 600L, 3600L, 640, 360, 30L)))
    val got = Codecs.decodeMp4Meta(Codecs.encodeMp4Meta(v, Array.emptyByteArray))
    assert(got == v)
  }
}
