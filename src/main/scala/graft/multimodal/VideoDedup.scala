package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Near-duplicate VIDEO detection: per-sampled-frame difference
  * hashes, banded candidate generation per (frame index, band), and a
  * matched-frame aggregation — the standard frame-fingerprint scheme
  * (a re-encode or lightly edited copy keeps almost every frame hash;
  * unrelated videos share none).
  *
  * Scale shape: decode+hash is one `mapPartitions` pass emitting
  * |videos| x |sampled frames| rows; candidates join on
  * (frame_idx, band j, band value) — aligned frames only, never
  * all-pairs, with the same per-bucket guard as
  * [[ImageDedup.nearDupPairs]]; the per-pair aggregation is one
  * map-combinable groupBy over candidate rows. Nothing is broadcast,
  * nothing is corpus-quadratic.
  */
object VideoDedup {

  /** 64-bit dHash of one luma plane: 9x8 nearest resample, horizontal
    * gradient sign per cell, packed low-word-first (the
    * [[graft.operators.BinaryAnn.packSignBits]] layout, same as
    * [[ImageDedup.dHash]] — one hash space across modalities).
    */
  def dHashLuma(luma: Array[Int], width: Int, height: Int): Array[Long] = {
    val g = Codecs.resampleNearestLuma(luma, width, height, 9, 8)
    val words = new Array[Long](2)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i = r * 8 + c
        if (g(r * 9 + c + 1) > g(r * 9 + c)) words(i / 32) |= 1L << (i % 32)
        c += 1
      }
      r += 1
    }
    words
  }

  /** One decode+hash pass over a media table's Y4M video rows: every
    * `stride`-th frame gets a luma dHash (a real video path seeks
    * keyframes; uncompressed Y4M samples by index). Rows of other
    * formats are dropped — no codec, no hash, the
    * [[ImageDedup.dHashes]] routing rule.
    *
    * @return (media_id, frame_idx, hash `array<bigint>`)
    */
  def frameHashes(
      media: Dataset[Multimodal.MediaRecord],
      stride: Int = 2): DataFrame = {
    require(stride > 0, "stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.collect {
        case m if m.format == "y4m" =>
          val v = Codecs.decodeY4m(m.content)
          (0 until v.frames.size by stride).map { f =>
            (m.media_id, f.toLong, dHashLuma(v.frames(f), v.width, v.height).toSeq)
          }
      }.flatten
    }.toDF("media_id", "frame_idx", "hash")
  }

  /** 16-bit band `j` (0..3) of a packed 64-bit hash. */
  private def bandCol(h: org.apache.spark.sql.Column, j: Int): org.apache.spark.sql.Column =
    shiftright(element_at(h, j / 2 + 1), (j % 2) * 16).bitwiseAND(lit(0xffffL))

  /** Near-duplicate video pairs: two videos match when at least
    * `minMatchedNum/minMatchedDen` of their ALIGNED sampled frames are
    * within `maxHamming` bits. Candidates come from a banded self-join
    * keyed by (frame_idx, band) — pigeonhole-lossless per frame at
    * `maxHamming` <= 3, so a qualifying pair can only be missed if a
    * (frame, band) bucket overflows `maxBucketSize` (a popular bucket
    * is a duplicate GROUP, the upstream guard argument).
    *
    * Videos with different sampled-frame counts compare over the
    * SHORTER prefix (`total_frames` = min of the two counts) — a
    * truncated copy still matches on what it kept.
    *
    * @return (id_a, id_b, matched_frames, total_frames, ham_sum) with
    *         id_a < id_b; ham_sum is summed over the MATCHED frames
    */
  def nearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 3,
      minMatchedNum: Int = 1,
      minMatchedDen: Int = 1,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16-bit banding is pigeonhole-lossless only up to Hamming 3")
    require(minMatchedNum > 0 && minMatchedDen > 0 && minMatchedNum <= minMatchedDen,
      "minMatched fraction must be in (0, 1]")
    val base = hashes.select(
      col("media_id").as("id"), col("frame_idx").as("f"), col("hash").as("h"))
    val counts = base.groupBy(col("id")).agg(count(lit(1)).as("__nf"))
    val banded = base.select(col("id"), col("f"), col("h"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("bj"), bandCol(col("h"), j).as("bv"))): _*)).as("b"))
      .select(col("id"), col("f"), col("h"),
        col("b.bj").as("bj"), col("b.bv").as("bv"))
    val bounded = banded.join(
      banded.groupBy(col("f"), col("bj"), col("bv"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .drop("__n"),
      Seq("f", "bj", "bv"))
    val a = bounded.select(col("f"), col("bj"), col("bv"),
      col("id").as("id_a"), col("h").as("__ha"))
    val b = bounded.select(col("f"), col("bj"), col("bv"),
      col("id").as("id_b"), col("h").as("__hb"))
    val framePairs = a.join(b, Seq("f", "bj", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("f"), col("__ha"), col("__hb"))
      .distinct()
      .select(col("id_a"), col("id_b"), col("f"),
        graft.operators.BinaryAnn.hammingWords(col("__ha"), col("__hb")).as("ham"))
      .filter(col("ham") <= maxHamming)
    framePairs
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("matched_frames"), sum(col("ham")).as("ham_sum"))
      .join(counts.select(col("id").as("id_a"), col("__nf").as("__na")), Seq("id_a"))
      .join(counts.select(col("id").as("id_b"), col("__nf").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("matched_frames"),
        least(col("__na"), col("__nb")).as("total_frames"), col("ham_sum"))
      .filter(col("matched_frames") * minMatchedDen >=
        col("total_frames") * minMatchedNum)
  }
}
