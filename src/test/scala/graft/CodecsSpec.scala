package graft

import graft.multimodal.{Codecs, Multimodal}

import org.apache.spark.sql.functions._

/** Pure-JVM BMP/WAV codecs: byte-level layout, round trips, known
  * bytes -> known values, and the decoded columns they feed through the
  * multimodal Dataset pipeline.
  */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  test("BMP round trip preserves exact pixels; layout is canonical") {
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0x102030, 0xffffff, 0x000000)
    val bytes = Codecs.encodeBmp(3, 2, px)
    // canonical header facts: magic, 54-byte offset, 24 bpp, BI_RGB
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    assert(bytes(10) == 54 && bytes(28) == 24 && bytes(30) == 0)
    // rows padded to 4 bytes: 3 px * 3 B = 9 -> 12 per row, 2 rows + 54
    assert(bytes.length == 54 + 24)
    val img = Codecs.decodeBmp(bytes)
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("BMP known bytes -> known luminance") {
    // all-white 2x2: luma = (0.299+0.587+0.114)*255/255 = 1
    val white = Codecs.encodeBmp(2, 2, Array.fill(4)(0xffffff))
    assert(Codecs.meanLuma(Codecs.decodeBmp(white)) == 1.0)
    // pure red: luma = 0.299 exactly
    val red = Codecs.encodeBmp(2, 2, Array.fill(4)(0xff0000))
    assert(math.abs(Codecs.meanLuma(Codecs.decodeBmp(red)) - 0.299) < 1e-12)
    // black -> 0
    val black = Codecs.encodeBmp(1, 1, Array(0)) // also exercises row padding (3 -> 4)
    assert(Codecs.meanLuma(Codecs.decodeBmp(black)) == 0.0)
  }

  test("BMP decode is FAILFAST on malformed input") {
    intercept[IllegalArgumentException](Codecs.decodeBmp("not a bitmap at all".getBytes))
    val good = Codecs.encodeBmp(2, 2, Array.fill(4)(0x808080))
    intercept[IllegalArgumentException](Codecs.decodeBmp(good.take(30))) // truncated
    val badDepth = good.clone(); badDepth(28) = 8 // 8-bit palette BMP unsupported
    intercept[IllegalArgumentException](Codecs.decodeBmp(badDepth))
  }

  test("BMP nearest-neighbor resample: exact on integral scale factors") {
    val img = Codecs.decodeBmp(Codecs.encodeBmp(2, 1, Array(0xff0000, 0x0000ff)))
    val up = Codecs.resampleNearest(img, 4, 2)
    assert(up.pixels.toSeq == Seq(
      0xff0000, 0xff0000, 0x0000ff, 0x0000ff,
      0xff0000, 0xff0000, 0x0000ff, 0x0000ff))
    val down = Codecs.resampleNearest(up, 2, 1)
    assert(down.pixels.toSeq == img.pixels.toSeq)
  }

  test("WAV round trip preserves exact samples; RMS matches closed form") {
    val samples = Array[Short](1000, -1000, 32767, -32768, 0, 12345)
    val bytes = Codecs.encodeWavPcm16(samples, 8000)
    assert(bytes.length == 44 + samples.length * 2)
    val wav = Codecs.decodeWavPcm16(bytes)
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.toSeq == samples.toSeq)
    // constant-amplitude signal: rms = amp / 32768 exactly
    val const = Codecs.encodeWavPcm16(Array.fill[Short](64)(16384), 44100)
    assert(Codecs.rms(Codecs.decodeWavPcm16(const)) == 0.5)
  }

  test("WAV decode walks unknown chunks and rejects non-PCM") {
    val base = Codecs.encodeWavPcm16(Array[Short](7, -7), 8000)
    // splice an unknown 4-byte chunk between WAVE and fmt
    val junk = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val spliced = base.take(12) ++ junk.array() ++ base.drop(12)
    // fix RIFF size
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(Codecs.decodeWavPcm16(spliced).samples.toSeq == Seq(7.toShort, -7.toShort))

    intercept[IllegalArgumentException](Codecs.decodeWavPcm16("RIFFxxxxJUNK".getBytes))
    val nonPcm = base.clone(); nonPcm(20) = 3 // IEEE float encoding tag
    intercept[IllegalArgumentException](Codecs.decodeWavPcm16(nonPcm))
  }

  test("extractFeatures computes decoded_mean from real pixels/samples") {
    val docs = Seq(
      (3L, "image doc payload text", "en", "s", 22L), // doc_id%3=0 -> image/bmp
      (1L, "audio doc payload text", "en", "s", 22L), // doc_id%3=1 -> audio/wav
      (2L, "video doc payload text", "en", "s", 22L)) // doc_id%3=2 -> video/mp4 stub
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMediaFromDocs(spark, docs)
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    // image: decoded_mean == meanLuma of the actual BMP content
    val imgRec = media.filter(col("media_id") === 3L).head()
    assert(feats(3L).decoded_mean.contains(Codecs.meanLuma(Codecs.decodeBmp(imgRec.content))))
    assert(feats(3L).decoded_mean.exists(v => v > 0 && v < 1))
    // audio: decoded_mean == rms of the actual WAV content
    val audRec = media.filter(col("media_id") === 1L).head()
    assert(feats(1L).decoded_mean.contains(Codecs.rms(Codecs.decodeWavPcm16(audRec.content))))
    // video: no codec -> None
    assert(feats(2L).decoded_mean.isEmpty)
  }

  test("empty-text docs synthesize and decode cleanly (no mod-by-zero)") {
    val docs = Seq(
      (3L, "", "en", "s", 0L), // image from empty text: all-zero pixels
      (1L, "", "en", "s", 0L), // audio from empty text: zero samples
      (2L, "", "en", "s", 0L)) // video stub: empty opaque bytes
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMediaFromDocs(spark, docs), dim = 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(3L).decoded_mean.contains(0.0)) // black image
    assert(feats(1L).decoded_mean.contains(0.0)) // silent (empty) audio
    assert(feats(2L).decoded_mean.isEmpty)
  }

  test("resize produces a valid BMP of the target geometry for image rows") {
    val docs = Seq((3L, "image doc payload text", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMediaFromDocs(spark, docs)
    val resized = Multimodal.resize(media, 8, 5).head()
    val img = Codecs.decodeBmp(resized.content) // throws if not a real BMP
    assert(img.width == 8 && img.height == 5)
    assert(resized.width == 8 && resized.height == 5)
  }
}
