package graft

import graft.multimodal.Codecs
import graft.multimodal.Codecs.{MkvMeta, MkvTrack}

import org.scalatest.funsuite.AnyFunSuite

class MkvSpec extends AnyFunSuite {

  private val av = MkvMeta("matroska", 1000000L, 4000L, Seq(
    MkvTrack("video", "V_VP9", 1920, 1080, 0L, 0),
    MkvTrack("audio", "A_OPUS", 0, 0, 48000L, 2)))

  test("encode -> decode round-trips the container metadata exactly") {
    val bytes = Codecs.encodeMkvMeta(av, Array.fill(48)(0x5a.toByte))
    assert(Codecs.decodeMkvMeta(bytes) == av)
  }

  test("payload rides the SimpleBlock opaquely and does not perturb the metadata") {
    val p1 = Codecs.encodeMkvMeta(av, Array.emptyByteArray)
    val p2 = Codecs.encodeMkvMeta(av, Array.tabulate(1000)(_.toByte))
    assert(Codecs.decodeMkvMeta(p1) == Codecs.decodeMkvMeta(p2))
    assert(p2.length == p1.length + 1000)
  }

  test("encoded size follows the documented closed form (the oracle's formula)") {
    // total = 92 + len(docType) + sum(trackEntry) + payload, where a
    // video entry is 25 + len(codec) and an audio entry 30 + len(codec)
    def expected(m: MkvMeta, p: Int): Int =
      92 + m.docType.length + m.tracks.map { t =>
        (if (t.trackType == "video") 25 else 30) + t.codec.length
      }.sum + p
    for (p <- Seq(0, 1, 48, 500)) {
      val payload = Array.fill(p)(7.toByte)
      assert(Codecs.encodeMkvMeta(av, payload).length == expected(av, p))
      val vOnly = MkvMeta("webm", 1000000L, 1000L,
        Seq(MkvTrack("video", "V_AV1", 64, 48, 0L, 0)))
      assert(Codecs.encodeMkvMeta(vOnly, payload).length == expected(vOnly, p))
    }
  }

  test("size vints of every width 1..8 parse to the same value") {
    // hand-build a tiny EBML header whose DocType size is re-encoded
    // at each width: id 0x4282, then an n-byte vint for size 4, "webm"
    def vint(n: Long, w: Int): Array[Byte] = {
      val v = n | (1L << (7 * w))
      Array.tabulate(w)(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte)
    }
    for (w <- 1 to 8) {
      val docType = Array(0x42.toByte, 0x82.toByte) ++ vint(4, w) ++
        "webm".getBytes("US-ASCII")
      val header = Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte) ++
        vint(docType.length.toLong, 2) ++ docType
      assert(Codecs.decodeMkvMeta(header).docType == "webm")
    }
  }

  test("unknown-size master elements extend to the end of their parent") {
    val base = Codecs.encodeMkvMeta(av, Array.emptyByteArray)
    // the Segment is the LAST top-level element with an 8-byte size
    // vint right after its 4-byte id: rewrite it as all-ones (unknown)
    val segOff = base.indexOfSlice(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte))
    assert(segOff > 0)
    val mut = base.clone()
    for (i <- 0 until 8) mut(segOff + 4 + i) = 0xff.toByte
    mut(segOff + 4) = 0x01.toByte // keep the 8-byte-width marker, value all ones
    for (i <- 1 until 8) mut(segOff + 4 + i) = 0xff.toByte
    assert(Codecs.decodeMkvMeta(mut) == av)
    // unknown size on a LEAF is structural corruption, not a fallback
    val leafMut = base.clone()
    val durOff = base.indexOfSlice(Array(0x44.toByte, 0x89.toByte, 0x88.toByte))
    assert(durOff > 0)
    leafMut(durOff + 2) = 0xff.toByte // Duration size 0x88 -> unknown
    val e = intercept[IllegalArgumentException](Codecs.decodeMkvMeta(leafMut))
    assert(e.getMessage.contains("unknown size on non-master"))
  }

  test("unknown elements (Void, Cluster internals) are skipped; defaults apply") {
    // an EBML header followed by a Segment holding only a Void element
    // and an Info with no TimestampScale: the Matroska 1 ms default holds
    def vint(n: Long, w: Int): Array[Byte] = {
      val v = n | (1L << (7 * w))
      Array.tabulate(w)(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte)
    }
    def leaf(id: Array[Byte], content: Array[Byte]): Array[Byte] =
      id ++ vint(content.length.toLong, 1) ++ content
    val docType = leaf(Array(0x42.toByte, 0x82.toByte), "matroska".getBytes("US-ASCII"))
    val header = Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte) ++
      vint(docType.length.toLong, 2) ++ docType
    val voidEl = leaf(Array(0xec.toByte), Array.fill(5)(0.toByte))
    val dur = leaf(Array(0x44.toByte, 0x89.toByte),
      java.nio.ByteBuffer.allocate(8).putDouble(2500.0).array())
    val info = Array(0x15.toByte, 0x49.toByte, 0xa9.toByte, 0x66.toByte) ++
      vint(dur.length.toLong, 2) ++ dur
    val seg = Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte) ++
      vint((voidEl.length + info.length).toLong, 8) ++ voidEl ++ info
    val got = Codecs.decodeMkvMeta(header ++ seg)
    assert(got == MkvMeta("matroska", 1000000L, 2500L, Nil))
  }

  test("corruption fails fast with typed errors") {
    val base = Codecs.encodeMkvMeta(av, Array.fill(16)(0x33.toByte))
    // a size that runs past the enclosing element must throw, not wrap
    val over = base.clone()
    val segOff = base.indexOfSlice(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte))
    over(segOff + 11) = (over(segOff + 11) + 0x40).toByte // inflate Segment size
    val e = intercept[IllegalArgumentException](Codecs.decodeMkvMeta(over))
    assert(e.getMessage.contains("past its container"))
    // truncation mid-element throws
    intercept[IllegalArgumentException](Codecs.decodeMkvMeta(base.take(base.length - 3)))
    // a first byte of 0 means a >8-byte vint: rejected
    intercept[IllegalArgumentException](
      Codecs.decodeMkvMeta(Array(0.toByte, 1.toByte, 2.toByte)))
    // a payload with no DocType is rejected
    intercept[IllegalArgumentException](
      Codecs.decodeMkvMeta(Array(0xec.toByte, 0x82.toByte, 1.toByte, 2.toByte)))
  }

  test("fuzz: garbage and single-byte mutations never escape as non-typed errors") {
    // deterministic LCG — no RNG state, reproducible failures
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    for (len <- 0 until 200) {
      val junk = Array.tabulate(len)(_ => (next() >>> 16).toByte)
      try { Codecs.decodeMkvMeta(junk); () }
      catch { case _: IllegalArgumentException => () } // the ONLY permitted escape
    }
    val base = Codecs.encodeMkvMeta(av, Array.fill(16)(0x33.toByte))
    for (i <- base.indices; delta <- Seq(1, 0x80)) {
      val mut = base.clone()
      mut(i) = (mut(i) + delta).toByte
      try { Codecs.decodeMkvMeta(mut); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("an audio-only webm container round-trips") {
    val a = MkvMeta("webm", 1000000L, 60000L,
      Seq(MkvTrack("audio", "A_OPUS", 0, 0, 48000L, 1)))
    assert(Codecs.decodeMkvMeta(Codecs.encodeMkvMeta(a, Array.emptyByteArray)) == a)
  }

  test("a 4-byte float Duration parses (real muxers emit both widths)") {
    val f4 = java.nio.ByteBuffer.allocate(4).putFloat(4000.0f).array()
    def vint(n: Long, w: Int): Array[Byte] = {
      val v = n | (1L << (7 * w))
      Array.tabulate(w)(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte)
    }
    def leaf(id: Array[Byte], content: Array[Byte]): Array[Byte] =
      id ++ vint(content.length.toLong, 1) ++ content
    val docType = leaf(Array(0x42.toByte, 0x82.toByte), "webm".getBytes("US-ASCII"))
    val header = Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte) ++
      vint(docType.length.toLong, 2) ++ docType
    val dur = leaf(Array(0x44.toByte, 0x89.toByte), f4)
    val info = Array(0x15.toByte, 0x49.toByte, 0xa9.toByte, 0x66.toByte) ++
      vint(dur.length.toLong, 2) ++ dur
    val seg = Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte) ++
      vint(info.length.toLong, 8) ++ info
    assert(Codecs.decodeMkvMeta(header ++ seg).durationTicks == 4000L)
  }
}
