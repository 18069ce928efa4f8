package graft

import graft.multimodal.{Codecs, Multimodal, VideoDedup}

import org.apache.spark.sql.functions._

/** Y4M codec roundtrip + strictness, frame-hash determinism, and the
  * matched-frame near-dup semantics on planted video fixtures.
  */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private def solidFrame(w: Int, h: Int, rgb: Int): Array[Int] =
    Array.fill(w * h)(rgb)

  private def gradientFrame(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(p => {
      val b = (p * 7 + seed * 13) % 256
      (b << 16) | (((b * 31) % 256) << 8) | ((b * 7) % 256)
    })

  test("Y4M encode/decode roundtrips the luma plane exactly") {
    val frames = Seq(gradientFrame(16, 8, 1), gradientFrame(16, 8, 2))
    val bytes = Codecs.encodeY4m(16, 8, frames)
    val v = Codecs.decodeY4m(bytes)
    assert(v.width == 16 && v.height == 8 && v.frames.size == 2)
    frames.zip(v.frames).foreach { case (px, luma) =>
      assert(luma.toSeq == px.map(Codecs.rgbToY).toSeq, "luma plane diverged")
    }
  }

  test("Y4M decode is strict: bad magic, exotic colorspace, truncation all throw") {
    val good = Codecs.encodeY4m(4, 4, Seq(solidFrame(4, 4, 0x808080)))
    intercept[IllegalArgumentException] {
      Codecs.decodeY4m("JUNK4MPEG2 W4 H4 C444\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Codecs.decodeY4m("YUV4MPEG2 W4 H4 Cmono\nFRAME\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Codecs.decodeY4m(good.dropRight(5)) // truncated last frame
    }
    intercept[IllegalArgumentException] {
      Codecs.decodeY4m("YUV4MPEG2 H4 C444\n".getBytes("US-ASCII")) // no W
    }
    intercept[IllegalArgumentException] { // 4:2:0 needs even dims
      Codecs.decodeY4m("YUV4MPEG2 W3 H4 C420\nFRAME\n".getBytes("US-ASCII"))
    }
  }

  test("Y4M decode handles the C420 family: luma plane exact, quarter-size chroma skipped") {
    // hand-build a C420jpeg stream: 4x2 luma ramp + 2x1 chroma planes
    val luma = Array(10, 20, 30, 40, 50, 60, 70, 80)
    val header = "YUV4MPEG2 W4 H2 F25:1 C420jpeg\nFRAME\n".getBytes("US-ASCII")
    val body = luma.map(_.toByte) ++ Array[Byte](99, 98) ++ Array[Byte](97, 96)
    val second = "FRAME\n".getBytes("US-ASCII") ++
      luma.map(v => (v + 1).toByte) ++ Array[Byte](1, 2) ++ Array[Byte](3, 4)
    val v = Codecs.decodeY4m(header ++ body ++ second)
    assert(v.width == 4 && v.height == 2 && v.frames.size == 2)
    assert(v.frames(0).toSeq == luma.toSeq)
    assert(v.frames(1).toSeq == luma.map(_ + 1).toSeq)
    // implicit-C default is 420: no C parameter at all
    val noC = "YUV4MPEG2 W4 H2\nFRAME\n".getBytes("US-ASCII") ++ body
    assert(Codecs.decodeY4m(noC).frames.head.toSeq == luma.toSeq)
  }

  test("frame hashes: identical content hashes identically; stride samples every 2nd frame") {
    val docs = Seq((1L, "some words for a tiny video fixture", 35L),
      (2L, "entirely different text content here yes", 40L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.syntheticVideosFromDocs(spark, docs, nFrames = 6)
    val h = VideoDedup.frameHashes(media, stride = 2)
      .as[(Long, Long, Seq[Long])].collect()
    assert(h.map(_._2).toSet == Set(0L, 2L, 4L), s"sampled frames: ${h.map(_._2).toSet}")
    assert(h.length == 6) // 2 videos x 3 sampled frames
    val again = VideoDedup.frameHashes(media, stride = 2)
      .as[(Long, Long, Seq[Long])].collect()
    assert(h.sortBy(r => (r._1, r._2)).map(r => (r._1, r._2, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._2)).map(r => (r._1, r._2, r._3)).toSeq)
  }

  test("near-dup pairs: exact copy matches on all frames, unrelated videos never pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", 63L),
      (2L, "completely different material about catalyst optimizer internals", 64L),
      (3L, "yet another unrelated string with its own words and rhythm", 58L))
      .toDF("doc_id", "text", "n_chars")
    val base = Multimodal.syntheticVideosFromDocs(spark, docs)
    val copies = base.filter(_.media_id == 1L).map(m => m.copy(media_id = 101L))
    val got = VideoDedup.nearDupPairs(
      VideoDedup.frameHashes(base.union(copies)), maxHamming = 0)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 101L, 3L, 3L, 0L)), s"got $got")
  }

  test("a noised copy stays within hamming budget; a frame-corrupted copy drops below the fraction") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog near the river", 59L))
      .toDF("doc_id", "text", "n_chars")
    val base = Multimodal.syntheticVideosFromDocs(spark, docs)
    // light noise: flip the blue channel of every 31st pixel of every
    // frame — a few gradient bits per frame at most
    val noised = base.map { m =>
      val v = Codecs.decodeY4m(m.content)
      // re-derive RGB frames from the doc text (the synthesis recipe),
      // flip, re-encode
      val text = "the quick brown fox jumps over the lazy dog near the river"
      val frames = (0 until 6).map { f =>
        Array.tabulate(v.width * v.height) { p =>
          val b = text.charAt((p + 13 * f) % text.length).toInt
          val px = ((b & 0xff) << 16) | (((b * 31) % 256) << 8) | ((b * 7) % 256)
          if (p % 31 == 0) px ^ 0xff else px
        }
      }
      m.copy(media_id = 201L, content = Codecs.encodeY4m(v.width, v.height, frames))
    }
    val gotNoise = VideoDedup.nearDupPairs(
      VideoDedup.frameHashes(base.union(noised)), maxHamming = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(gotNoise.map(r => (r._1, r._2, r._3, r._4)) == Seq((1L, 201L, 3L, 3L)),
      s"noised copy should match on every frame: $gotNoise")
    // corrupt two of three sampled frames outright: inverted luma
    // everywhere flips (almost) no gradient... use a REVERSED read —
    // different gradients — so those frames exceed any small budget
    val corrupted = base.map { m =>
      val v = Codecs.decodeY4m(m.content)
      val text = "the quick brown fox jumps over the lazy dog near the river"
      val frames = (0 until 6).map { f =>
        Array.tabulate(v.width * v.height) { p =>
          val idx = if (f <= 2) (p * 3 + 7 * f + 1) % text.length
            else (p + 13 * f) % text.length
          val b = text.charAt(idx).toInt
          ((b & 0xff) << 16) | (((b * 31) % 256) << 8) | ((b * 7) % 256)
        }
      }
      m.copy(media_id = 301L, content = Codecs.encodeY4m(v.width, v.height, frames))
    }
    val gotCorrupt = VideoDedup.nearDupPairs(
      VideoDedup.frameHashes(base.union(corrupted)), maxHamming = 3,
      minMatchedNum = 1, minMatchedDen = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // frames 0 and 2 diverge, frame 4 is identical: 1/3 matched — the
    // all-frames policy rejects it, a 1/3 threshold accepts it
    assert(!gotCorrupt.exists(r => r._2 == 301L && r._3 == r._4),
      s"corrupted copy must not match all frames: $gotCorrupt")
    val lenient = VideoDedup.nearDupPairs(
      VideoDedup.frameHashes(base.union(corrupted)), maxHamming = 3,
      minMatchedNum = 1, minMatchedDen = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(lenient.exists(r => r._2 == 301L), s"1/3 threshold should accept: $lenient")
  }

  test("extractFeatures decodes y4m for real: decoded_mean and frames_sampled") {
    val docs = Seq((7L, "twelve plain words in a row for the gate to chew on", 51L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.syntheticVideosFromDocs(spark, docs)
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.media_type == "video" && f.frames_sampled == 3)
    val v = Codecs.decodeY4m(media.collect().head.content)
    assert(f.decoded_mean.contains(Codecs.meanLumaVideo(v)))
    assert(f.decoded_mean.get > 0.0 && f.decoded_mean.get < 1.0)
  }

  test("frame store: save -> probe matches aligned frames; append absorbs survivors") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", 63L),
      (2L, "completely different material about catalyst optimizer internals", 64L),
      (3L, "yet another unrelated string with its own words and rhythm", 58L))
      .toDF("doc_id", "text", "n_chars")
    val base = Multimodal.syntheticVideosFromDocs(spark, docs)
    val path = tmpDir("video-store") + "/store"
    VideoDedup.saveFrameStore(VideoDedup.frameHashes(base), path)
    val store = VideoDedup.loadFrameStore(spark, path)
    // increment: an exact copy of video 1 and a fresh video
    val inc = base.filter(_.media_id == 1L).map(m => m.copy(media_id = 101L))
      .union(Multimodal.syntheticVideosFromDocs(spark,
        Seq((102L, "a brand new clip nothing like the others at all", 47L))
          .toDF("doc_id", "text", "n_chars")))
    val got = VideoDedup.probeFrameStore(
      VideoDedup.frameHashes(inc), store, maxHamming = 0)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((101L, 1L, 3L, 3L, 0L)), s"got $got")
    // absorb the fresh survivor; a later copy of IT now matches
    VideoDedup.appendToFrameStore(spark, path,
      VideoDedup.frameHashes(inc.filter(_.media_id == 102L)))
    val store2 = VideoDedup.loadFrameStore(spark, path)
    val later = VideoDedup.probeFrameStore(
      VideoDedup.frameHashes(
        inc.filter(_.media_id == 102L).map(m => m.copy(media_id = 202L))),
      store2, maxHamming = 0)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(later == Seq((202L, 102L, 3L, 3L, 0L)), s"got $later")
  }

  test("banded candidate plan never goes cartesian") {
    val docs = (1L to 8L).map(i => (i, s"document number $i with words", 28L))
      .toDF("doc_id", "text", "n_chars")
    val plan = VideoDedup.nearDupPairs(
      VideoDedup.frameHashes(Multimodal.syntheticVideosFromDocs(spark, docs)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
  }
}
