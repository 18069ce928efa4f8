package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Audio perceptual-hash near-duplicate detection — the WAV sibling of
  * [[ImageDedup]]: a 64-bit ENERGY-ENVELOPE hash computed from real
  * decoded PCM-16 samples ([[Codecs.decodeWavPcm16]]), in the same
  * two-32-bit-word layout, paired by the same pigeonhole-lossless
  * Hamming-LSH bander ([[ImageDedup.nearDupPairs]] — the hash layout,
  * not the modality, is what the bander needs).
  *
  * The hash is dHash's idea on the time axis: split the clip into 65
  * equal windows, and set bit `i` iff window `i+1` carries more MEAN
  * energy than window `i` — 64 loudness-gradient signs. Energies are
  * exact integer sums of squared samples and the mean comparison is
  * cross-multiplied (`e₁·n₀ > e₀·n₁` — no division), so every bit
  * replays on any engine. Loudness gradients survive what sample
  * hashes don't: uniform volume change (scaling multiplies every
  * energy by ~c², leaving comparisons nearly fixed — truncation flips
  * at most the bits on near-ties), re-encoding, and sparse additive
  * noise.
  *
  * Scale shape: identical to the image path — one `mapPartitions`
  * decode pass emitting 8 bytes per clip, band-keyed ID shuffles,
  * 16-byte hashes through the verify join.
  */
object AudioDedup {

  /** Window count: 64 adjacent-energy comparisons. */
  val Windows: Int = 65

  /** 64-bit energy-envelope hash of decoded PCM-16 samples, packed as
    * two 32-bit words (low word first). Requires at least [[Windows]]
    * samples so every window is non-empty (shorter clips carry no
    * 64-gradient envelope to hash — [[envelopeHashes]] drops them).
    */
  def envelopeHash(samples: Array[Short]): Array[Long] = {
    val n = samples.length
    require(n >= Windows, s"need >= $Windows samples, got $n")
    val e = new Array[Long](Windows)
    val wn = new Array[Long](Windows)
    var j = 0
    while (j < Windows) {
      val lo = j * n / Windows
      val hi = (j + 1) * n / Windows
      var s = 0L
      var i = lo
      while (i < hi) { val v = samples(i).toLong; s += v * v; i += 1 }
      e(j) = s; wn(j) = hi - lo
      j += 1
    }
    val words = new Array[Long](2)
    var i = 0
    while (i < 64) {
      if (cmpProducts(e(i + 1), wn(i), e(i), wn(i + 1)) > 0) words(i / 32) |= 1L << (i % 32)
      i += 1
    }
    words
  }

  /** Compare `a*b` vs `c*d` in full 128-bit precision (all operands
    * non-negative). The naive Long product overflows for realistic
    * audio — full-scale PCM-16 at 44.1 kHz wraps past roughly two
    * minutes of samples (e ~ 1e9·n/65 times wn ~ n/65) — silently
    * flipping envelope bits, while the SQL oracle evaluates the same
    * comparison in int128; this keeps the engines bit-identical at
    * any clip length.
    */
  private def cmpProducts(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** One decode+hash pass over a media table's WAV rows; rows of other
    * formats, and clips shorter than [[Windows]] samples, are dropped.
    *
    * @return (media_id, hash `array<bigint>` of two 32-bit words)
    */
  def envelopeHashes(media: Dataset[Multimodal.MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap {
        case m if m.format == "wav" =>
          val wav = Codecs.decodeWavPcm16(m.content)
          if (wav.samples.length >= Windows)
            Some((m.media_id, envelopeHash(wav.samples).toSeq))
          else None
        case _ => None
      }
    }.toDF("media_id", "hash")
  }

  /** Banded near-dup pairs — the shared 64-bit Hamming bander. */
  def nearDupPairs(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      maxBucketPairs: Long = ImageDedup.defaultBucketPairBudget): DataFrame =
    ImageDedup.nearDupPairs(hashes, idCol, hashCol, maxHamming, maxBucketPairs)
}
