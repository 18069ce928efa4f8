package graft

import graft.multimodal.{AudioDedup, Codecs, Multimodal}

import org.apache.spark.sql.functions._

class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private def clip(n: Int, seed: Int): Array[Short] =
    Array.tabulate(n)(i => (((i * 37 + seed * 101) % 256 - 128) * 200).toShort)

  test("envelope hash is exactly invariant under power-of-two volume scaling") {
    val base = clip(1024, seed = 3)
    val h0 = AudioDedup.envelopeHash(base).toSeq
    // s -> s/4 with exact truncation: every squared sum scales by
    // exactly 1/16 only when all samples are multiples of 4 — they are
    // (x * 200 is a multiple of 4), so every comparison is preserved
    val quarter = base.map(s => (s / 4).toShort)
    assert(AudioDedup.envelopeHash(quarter).toSeq == h0)
    // and through a real encode/decode round trip
    val rt = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(base, 8000))
    assert(AudioDedup.envelopeHash(rt.samples).toSeq == h0)
  }

  test("long loud clips hash without Long overflow (128-bit comparison)") {
    // ~6.6M full-scale-ish samples (~2.5 min at 44.1 kHz): each window's
    // energy sum e ~ 1e9 * 100k and window size wn ~ 100k, so the naive
    // cross-multiplied comparison e*wn wraps Long. The hash must equal
    // a BigInt evaluation of the same comparisons.
    val n = 65 * 110000 + 17 // non-multiple of 65: unequal window sizes
    val big = Array.tabulate(n)(i => (if ((i / 3) % 2 == 0) 30000 else -30000).toShort)
    // make window energies vary so both comparison outcomes occur
    var i = 0
    while (i < n) { if ((i / (n / 65)) % 2 == 1) big(i) = (big(i) / 3).toShort; i += 1 }
    val got = AudioDedup.envelopeHash(big)
    // independent BigInt reference of the same windowing
    val e = new Array[BigInt](65); val wn = new Array[Long](65)
    var j = 0
    while (j < 65) {
      val lo = j.toLong * n / 65; val hi = (j + 1).toLong * n / 65
      var s = BigInt(0); var k = lo
      while (k < hi) { val v = BigInt(big(k.toInt).toInt); s += v * v; k += 1 }
      e(j) = s; wn(j) = hi - lo; j += 1
    }
    val words = new Array[Long](2)
    var b = 0
    while (b < 64) {
      if (e(b + 1) * wn(b) > e(b) * wn(b + 1)) words(b / 32) |= 1L << (b % 32)
      b += 1
    }
    assert(got.toSeq == words.toSeq,
      s"overflow-era hash diverged from BigInt reference: got=${got.toSeq} want=${words.toSeq}")
    // sanity: the naive Long arithmetic genuinely overflows here
    assert((0 until 64).exists { k => e(k + 1) * wn(k) > BigInt(Long.MaxValue) },
      "fixture no longer exercises the overflow range")
  }

  test("sparse additive noise flips few bits") {
    val base = clip(1024, seed = 7)
    val noisy = base.zipWithIndex.map { case (s, i) =>
      if (i % 11 == 0) (s + 500).toShort else s
    }
    val a = AudioDedup.envelopeHash(base)
    val b = AudioDedup.envelopeHash(noisy)
    val ham = (0 until 2).map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum
    assert(ham <= 6, s"sparse noise flipped $ham bits")
  }

  test("clips shorter than the window count are dropped, wav rows hash") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", "wav", 0, 0, 0L,
        Codecs.encodeWavPcm16(clip(256, 1), 8000)),
      Multimodal.MediaRecord(2L, "audio", "wav", 0, 0, 0L,
        Codecs.encodeWavPcm16(clip(32, 2), 8000)),
      Multimodal.MediaRecord(3L, "image", "bmp", 2, 2, 0L,
        Codecs.encodeBmp(2, 2, Array(1, 2, 3, 4))))
      .toDS()
    val got = AudioDedup.envelopeHashes(media)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) == AudioDedup.envelopeHash(clip(256, 1)).toSeq)
  }

  test("banded pairs equal all-pairs truth at Hamming <= 3 over clips") {
    val clips = (0 until 10).flatMap { s =>
      val b = clip(512, s)
      val n = b.clone(); n(17) = (n(17) + 300).toShort
      Seq((s.toLong, b), (s + 100L, n))
    }
    val hashes = clips.map { case (id, c) => (id, AudioDedup.envelopeHash(c).toSeq) }
    val truth = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      ham = (0 until 2).map(i => java.lang.Long.bitCount(ha(i) ^ hb(i))).sum
      if ham <= 3
    } yield (ia, ib, ham.toLong)).toSet
    val got = AudioDedup.nearDupPairs(
      hashes.toDF("media_id", "hash"), "media_id", "hash", maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("ham").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == truth)
    assert(truth.nonEmpty, "fixture produced no true pairs")
  }
}
