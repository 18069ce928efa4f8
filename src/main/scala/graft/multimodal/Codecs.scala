package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal pipeline: uncompressed
  * 24-bit BMP (BITMAPINFOHEADER) and RIFF/WAVE PCM-16. Zero external
  * dependencies — no image/audio libraries exist on this classpath, and
  * these two containers are simple enough that a complete, correct
  * parser fits in a page. They make the feature-extraction path compute
  * from REAL decoded pixels/samples; formats beyond them (png/mp4/...)
  * remain declared stubs in [[Multimodal]].
  */
object Codecs extends Serializable {

  /** Decoded image: `0xRRGGBB` pixels, row-major, top-down. */
  final case class BmpImage(width: Int, height: Int, pixels: Array[Int])

  /** Decoded audio: interleaved PCM-16 samples. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---------------------------------------------------------------- BMP

  /** Encode `0xRRGGBB` top-down pixels as an uncompressed 24-bit BMP
    * (54-byte BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows
    * padded to 4 bytes — the classic Windows 3.x layout).
    */
  def encodeBmp(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"need $width x $height pixels, got ${pixels.length}")
    val rowSize = (width * 3 + 3) & ~3
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
    buf.putShort(1).putShort(24) // planes, bits-per-pixel
    buf.putInt(0).putInt(dataSize) // BI_RGB (no compression), image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette unused
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        buf.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte).put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode an uncompressed 24-bit BMP. Strict: validates the magic,
    * header size, bit depth and compression mode, and throws on
    * anything else (FAILFAST, like the Avro decode path).
    */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    require(buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte, "not a BMP: bad magic")
    val pixelOffset = buf.getInt(10)
    require(buf.getInt(14) >= 40, "unsupported BMP header")
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    require(width > 0 && height > 0, s"unsupported BMP geometry ${width}x$height")
    require(buf.getShort(28) == 24, s"unsupported bit depth ${buf.getShort(28)}")
    require(buf.getInt(30) == 0, "unsupported BMP compression")
    val rowSize = (width * 3 + 3) & ~3
    require(bytes.length >= pixelOffset + rowSize * height, "truncated BMP pixel data")
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val src = pixelOffset + (height - 1 - y) * rowSize // stored bottom-up
      var x = 0
      while (x < width) {
        val b = bytes(src + x * 3) & 0xff
        val g = bytes(src + x * 3 + 1) & 0xff
        val r = bytes(src + x * 3 + 2) & 0xff
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, pixels)
  }

  /** Mean Rec.601 luminance of decoded pixels, normalized to [0, 1]. */
  def meanLuma(img: BmpImage): Double = {
    var sum = 0.0
    var i = 0
    while (i < img.pixels.length) {
      val p = img.pixels(i)
      sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
      i += 1
    }
    sum / img.pixels.length / 255.0
  }

  /** Nearest-neighbor resample of a decoded image. */
  def resampleNearest(img: BmpImage, width: Int, height: Int): BmpImage = {
    require(width > 0 && height > 0)
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val sy = y * img.height / height
      var x = 0
      while (x < width) {
        out(y * width + x) = img.pixels(sy * img.width + x * img.width / width)
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, out)
  }

  // ---------------------------------------------------------------- WAV

  /** Encode mono PCM-16 samples as RIFF/WAVE (fmt + data chunks). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode RIFF/WAVE PCM-16: walks the chunk list (ignoring unknown
    * chunks like LIST/INFO), reads `fmt ` then `data`. Strict on the
    * container and sample format; throws otherwise.
    */
  def decodeWavPcm16(bytes: Array[Byte]): WavAudio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = tag(bytes, pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length, s"truncated '$id' chunk")
      id match {
        case "fmt " =>
          require(size >= 16, "short fmt chunk")
          require(buf.getShort(pos + 8) == 1, "unsupported WAV encoding (not PCM)")
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          require(buf.getShort(pos + 22) == 16, "unsupported bit depth (not PCM-16)")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "no data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  /** Root-mean-square amplitude of decoded samples, normalized to [0, 1]. */
  def rms(wav: WavAudio): Double = {
    if (wav.samples.isEmpty) return 0.0
    var sum = 0.0
    var i = 0
    while (i < wav.samples.length) {
      val s = wav.samples(i).toDouble
      sum += s * s
      i += 1
    }
    math.sqrt(sum / wav.samples.length) / 32768.0
  }

  private def tag(bytes: Array[Byte], pos: Int): String =
    new String(bytes, pos, 4, "US-ASCII")

  // ---------------------------------------------------------------- Y4M

  /** Decoded video: per-frame planes, C444 (one Y, U, V byte per
    * pixel, planar). `frames(f)` holds the LUMA plane as 0..255 ints —
    * the channel every perceptual hash reads; chroma is parsed and
    * validated but not retained (nothing downstream consumes it).
    */
  final case class Y4mVideo(width: Int, height: Int, frames: Seq[Array[Int]])

  /** Integer BT.601 RGB→YUV used by [[encodeY4m]]: Y is
    * [[ImageDedup.luma1000]] div 1000 — the same grid the image hash
    * uses, so a video frame's stored Y plane replays from source RGB
    * with one integer expression.
    */
  def rgbToY(p: Int): Int =
    (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000

  /** Encode `0xRRGGBB` frames as YUV4MPEG2, C444 planar — the
    * plain-text-headered uncompressed video container (`YUV4MPEG2
    * W.. H.. F25:1 C444\n` then `FRAME\n` + Y,U,V planes per frame).
    * Simple enough to be complete and correct with zero dependencies,
    * same argument as BMP/WAV.
    */
  def encodeY4m(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty, "need at least one frame")
    require(frames.forall(_.length == width * height),
      s"every frame must carry $width x $height pixels")
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val n = width * height
    val buf = ByteBuffer.allocate(header.length + frames.size * (frameMark.length + 3 * n))
    buf.put(header)
    frames.foreach { px =>
      buf.put(frameMark)
      var i = 0
      while (i < n) { buf.put(rgbToY(px(i)).toByte); i += 1 }
      i = 0
      while (i < n) {
        val p = px(i)
        val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        buf.put((((-169 * r - 331 * g + 500 * b) / 1000) + 128).toByte)
        i += 1
      }
      i = 0
      while (i < n) {
        val p = px(i)
        val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        buf.put((((500 * r - 419 * g - 81 * b) / 1000) + 128).toByte)
        i += 1
      }
    }
    buf.array()
  }

  /** Decode a YUV4MPEG2 stream: C444 (what [[encodeY4m]] writes) and
    * the 4:2:0 family (`C420`/`C420jpeg`/`C420paldv`/`C420mpeg2` —
    * the in-the-wild default; chroma planes are quarter-size, the
    * luma plane every hash consumes is identical). Strict FAILFAST
    * like the other codecs: validates the signature, requires W/H,
    * rejects other colorspaces and odd-dimension 4:2:0, throws on
    * truncated frames.
    */
  def decodeY4m(bytes: Array[Byte]): Y4mVideo = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "truncated Y4M: no header line")
    val header = new String(bytes, 0, nl, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"), s"not a Y4M stream: $header")
    val params = header.split(' ').drop(1)
    def param(k: Char): Option[String] =
      params.find(p => p.nonEmpty && p.head == k).map(_.tail)
    val width = param('W').map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("Y4M header missing W"))
    val height = param('H').map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("Y4M header missing H"))
    require(width > 0 && height > 0, s"bad Y4M geometry ${width}x$height")
    val cs = param('C').getOrElse("420") // Y4M default is 4:2:0
    val n = width * height
    val chromaBytes = cs match {
      case "444" => 2 * n
      case "420" | "420jpeg" | "420paldv" | "420mpeg2" =>
        require(width % 2 == 0 && height % 2 == 0,
          s"C$cs requires even dimensions, got ${width}x$height")
        2 * ((width / 2) * (height / 2))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Y4M colorspace C$other (C444 and the C420 family only)")
    }
    val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    var pos = nl + 1
    while (pos < bytes.length) {
      val fnl = bytes.indexOf('\n'.toByte, pos)
      require(fnl > pos, "truncated Y4M: unterminated FRAME header")
      require(new String(bytes, pos, fnl - pos, "US-ASCII").startsWith("FRAME"),
        "corrupt Y4M: expected FRAME marker")
      require(bytes.length >= fnl + 1 + n + chromaBytes,
        s"truncated Y4M frame at byte $pos")
      val luma = new Array[Int](n)
      var i = 0
      while (i < n) { luma(i) = bytes(fnl + 1 + i) & 0xff; i += 1 }
      frames += luma
      pos = fnl + 1 + n + chromaBytes
    }
    require(frames.nonEmpty, "Y4M stream carries no frames")
    Y4mVideo(width, height, frames.toSeq)
  }

  /** Nearest-neighbor resample of one luma plane — [[resampleNearest]]
    * for the channel video hashing consumes.
    */
  def resampleNearestLuma(
      luma: Array[Int], width: Int, height: Int,
      outW: Int, outH: Int): Array[Int] = {
    require(outW > 0 && outH > 0)
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * height / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = luma(sy * width + x * width / outW)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Mean luma of a decoded video across every frame, in [0, 1]. */
  def meanLumaVideo(v: Y4mVideo): Double = {
    var sum = 0.0
    var n = 0L
    v.frames.foreach { f =>
      var i = 0
      while (i < f.length) { sum += f(i); i += 1 }
      n += f.length
    }
    sum / n / 255.0
  }

  // ------------------------------------------------------- MP4 (ISO BMFF)

  /** One MP4 track's container-level metadata: handler type (`vide` /
    * `soun`), the first sample entry's codec fourcc, media timescale
    * and duration (mdhd), presentation width/height (tkhd 16.16 fixed,
    * zero for audio), and the stsz sample count.
    */
  final case class Mp4Track(
      handler: String,
      codec: String,
      timescale: Long,
      duration: Long,
      width: Int,
      height: Int,
      sampleCount: Long)

  /** Container-level MP4 metadata: ftyp major brand + per-track rows. */
  final case class Mp4Meta(majorBrand: String, tracks: Seq[Mp4Track])

  /** Encode container-level MP4 metadata as a REAL ISO BMFF box tree
    * (ftyp + moov[mvhd + trak[tkhd + mdia[mdhd + hdlr +
    * minf[stbl[stsd + stsz]]]]] + mdat) with the codec payload riding
    * `mdat` as opaque bytes. This is the metadata tier the multimodal
    * contract promises for compressed video: the CONTAINER structure
    * is genuine and round-trips through [[decodeMp4Meta]]; the sample
    * payload stays un-decoded (no AVC/HEVC codecs exist pure-JVM
    * here, and the hash/band machinery downstream is codec-agnostic).
    */
  def encodeMp4Meta(meta: Mp4Meta, payload: Array[Byte]): Array[Byte] = {
    require(meta.majorBrand.length == 4, "major brand must be 4 chars")
    def box(fourcc: String, content: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + content.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + content.length)
      b.put(fourcc.getBytes("US-ASCII"))
      b.put(content)
      b.array()
    }
    def full(fourcc: String)(fill: ByteBuffer => Unit, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(size + 4).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version 0, flags 0
      fill(b)
      box(fourcc, b.array())
    }
    val ftyp = box("ftyp",
      (meta.majorBrand + "\u0000\u0000\u0000\u0000isom").getBytes("US-ASCII"))
    val mvhd = full("mvhd")({ b =>
      b.putInt(0).putInt(0).putInt(1000)
      b.putInt(meta.tracks.map(t => t.duration * 1000 / math.max(1L, t.timescale))
        .foldLeft(0L)(math.max).toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).position(b.position() + 10)
      identityMatrix(b); b.position(b.position() + 24)
      b.putInt(meta.tracks.size + 1)
    }, 96)
    val traks = meta.tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = full("tkhd")({ b =>
        b.putInt(0).putInt(0).putInt(i + 1).putInt(0)
        b.putInt((t.duration * 1000 / math.max(1L, t.timescale)).toInt)
        b.position(b.position() + 16)
        identityMatrix(b)
        b.putInt(t.width << 16).putInt(t.height << 16)
      }, 80)
      val mdhd = full("mdhd")({ b =>
        b.putInt(0).putInt(0).putInt(t.timescale.toInt).putInt(t.duration.toInt)
        b.putShort(0x55c4.toShort).putShort(0) // language "und"
      }, 20)
      val hdlr = full("hdlr")({ b =>
        b.putInt(0)
        b.put(t.handler.getBytes("US-ASCII"))
        b.position(b.position() + 12)
        b.put(0.toByte) // empty name cstring
      }, 21)
      require(t.handler.length == 4 && t.codec.length == 4,
        "handler and codec fourccs must be 4 chars")
      val stsd = full("stsd")({ b =>
        b.putInt(1) // entry count
        b.putInt(16).put(t.codec.getBytes("US-ASCII")) // minimal sample entry
        b.position(b.position() + 6)
        b.putShort(1) // data reference index
      }, 20)
      val stsz = full("stsz")({ b =>
        b.putInt(0).putInt(t.sampleCount.toInt) // per-sample sizes elided
      }, 8)
      val stbl = box("stbl", stsd ++ stsz)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    val mdat = box("mdat", payload)
    ftyp ++ moov ++ mdat
  }

  private def identityMatrix(b: ByteBuffer): Unit = {
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
    ()
  }

  /** Parse an ISO BMFF box tree and return the container-level
    * metadata. A real recursive box walker — handles 64-bit
    * `largesize` boxes, size==0 (extends to end of enclosing box),
    * and skips unknown boxes — FAILFAST on structural corruption
    * (truncated box, size under the header length), like every other
    * decode path here. Codec payloads (`mdat`) are not touched.
    */
  def decodeMp4Meta(bytes: Array[Byte]): Mp4Meta = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var brand = ""
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    var handler = ""; var codec = ""; var timescale = 0L; var duration = 0L
    var width = 0; var height = 0; var sampleCount = 0L
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, "US-ASCII")
    def walk(start: Int, end: Int, depth: Int): Unit = {
      require(depth < 16, "box nesting too deep (corrupt container?)")
      var off = start
      while (off < end) {
        require(end - off >= 8, s"truncated box header at offset $off")
        var size = be32(off)
        val typ = fourcc(off + 4)
        var hdr = 8
        if (size == 1) {
          require(end - off >= 16, s"truncated largesize box at $off")
          size = be64(off + 8); hdr = 16
        } else if (size == 0) size = (end - off).toLong
        require(size >= hdr && off + size <= end,
          s"box '$typ' at $off claims $size bytes past its container")
        val cStart = off + hdr
        val cEnd = off + size.toInt
        // every leaf read below stays inside [cStart, cEnd): a corrupt
        // box that declares too little content fails HERE with a typed
        // error instead of reading a neighbor's bytes (or past the
        // array) — the fuzz spec holds the parser to exactly this
        def need(n: Int): Unit =
          require(cEnd - cStart >= n, s"box '$typ' content too short: ${cEnd - cStart} < $n")
        typ match {
          case "ftyp" => need(4); brand = fourcc(cStart)
          case t if containers(t) =>
            if (t == "trak") {
              handler = ""; codec = ""; timescale = 0L; duration = 0L
              width = 0; height = 0; sampleCount = 0L
            }
            walk(cStart, cEnd, depth + 1)
            if (t == "trak")
              tracks += Mp4Track(handler, codec, timescale, duration,
                width, height, sampleCount)
          case "tkhd" =>
            // version-0 layout: width/height are the LAST 8 bytes
            need(84)
            width = (be32(cEnd - 8) >> 16).toInt
            height = (be32(cEnd - 4) >> 16).toInt
          case "mdhd" =>
            need(20)
            timescale = be32(cStart + 12); duration = be32(cStart + 16)
          case "hdlr" => need(12); handler = fourcc(cStart + 8)
          case "stsd" =>
            need(8)
            if (be32(cStart + 4) > 0) { need(16); codec = fourcc(cStart + 12) }
          case "stsz" =>
            need(12)
            sampleCount = be32(cStart + 8)
          case _ => // unknown box: skip
        }
        off = cEnd
      }
    }
    walk(0, bytes.length, 0)
    require(brand.nonEmpty, "no ftyp box: not an ISO BMFF container")
    Mp4Meta(brand, tracks.toSeq)
  }

  // ------------------------------------------------- Matroska (EBML)

  /** One Matroska track's container-level metadata: track type
    * (`video` / `audio`), the CodecID string (`V_VP9`, `A_OPUS`, ...),
    * pixel dimensions (video, zero for audio) and sampling rate /
    * channel count (audio, zero for video).
    */
  final case class MkvTrack(
      trackType: String,
      codec: String,
      width: Int,
      height: Int,
      samplingHz: Long,
      channels: Int)

  /** Container-level Matroska metadata: EBML DocType (`matroska` /
    * `webm`), the Segment Info timestamp scale (ns per tick) and
    * duration (in ticks), plus per-track rows.
    */
  final case class MkvMeta(
      docType: String,
      timestampScaleNs: Long,
      durationTicks: Long,
      tracks: Seq[MkvTrack])

  // Matroska element IDs (RFC 8794 EBML + the Matroska DocType),
  // stored marker-bit-inclusive as the spec compares them.
  private val EbmlHeader = 0x1A45DFA3L
  private val DocTypeId = 0x4282L
  private val SegmentId = 0x18538067L
  private val InfoId = 0x1549A966L
  private val TimestampScaleId = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val TracksId = 0x1654AE6BL
  private val TrackEntryId = 0xAEL
  private val TrackTypeId = 0x83L
  private val CodecIdId = 0x86L
  private val VideoId = 0xE0L
  private val PixelWidthId = 0xB0L
  private val PixelHeightId = 0xBAL
  private val AudioId = 0xE1L
  private val SamplingFreqId = 0xB5L
  private val ChannelsId = 0x9FL
  private val ClusterId = 0x1F43B6E7L
  private val ClusterTimestampId = 0xE7L
  private val SimpleBlockId = 0xA3L

  /** Encode container-level Matroska metadata as a REAL EBML tree
    * (EBML header with DocType + Segment[Info[TimestampScale,
    * Duration] + Tracks[TrackEntry...] + Cluster[Timestamp,
    * SimpleBlock]]) with the codec payload riding a genuine
    * SimpleBlock (track VINT + relative timestamp + keyframe flag) as
    * opaque bytes. Same contract as [[encodeMp4Meta]]: the CONTAINER
    * structure is genuine and round-trips through [[decodeMkvMeta]];
    * the block payload stays un-decoded (no VP9/AV1/Opus codecs exist
    * pure-JVM here). Size VINTs are fixed-width (1 byte for leaves,
    * 2 bytes for master elements, 8 bytes for the Segment — a layout
    * real muxers use for streamability), so the encoded size is an
    * affine function of the string fields and payload length; the
    * MkvSpec pins that closed form.
    */
  def encodeMkvMeta(meta: MkvMeta, payload: Array[Byte]): Array[Byte] = {
    require(meta.docType.nonEmpty && meta.docType.length < 64, "bad DocType")
    require(payload.length <= 16000, "payload too large for the fixed-width layout")
    def idBytes(id: Long): Array[Byte] = {
      // IDs are stored marker-inclusive: emit exactly the bytes whose
      // big-endian value is the id, 1..4 bytes
      val w = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
              else if (id <= 0xffffffL) 3 else 4
      Array.tabulate(w)(i => ((id >> (8 * (w - 1 - i))) & 0xff).toByte)
    }
    def sizeVint(n: Long, width: Int): Array[Byte] = {
      // width-byte VINT: marker bit 1 << (7 - (width-1)) in the first
      // byte, value in the remaining 7*width bits
      require(n >= 0 && n < (1L << (7 * width)) - 1, s"size $n too big for $width-byte vint")
      val v = n | (1L << (7 * width))
      Array.tabulate(width)(i => ((v >> (8 * (width - 1 - i))) & 0xff).toByte)
    }
    def el(id: Long, content: Array[Byte], sizeWidth: Int): Array[Byte] =
      idBytes(id) ++ sizeVint(content.length.toLong, sizeWidth) ++ content
    def leaf(id: Long, content: Array[Byte]): Array[Byte] = el(id, content, 1)
    def uintBytes(v: Long, width: Int): Array[Byte] = {
      // mirror sizeVint's range check: silently truncating a value
      // that overflows its fixed field (timestamp scale >= 2^32,
      // track/channel counts > 255, dims >= 2^16) would emit a
      // corrupted container with no error, breaking the codec
      // family's fail-fast contract on the ENCODE side
      require(v >= 0 && (width == 8 || v < (1L << (8 * width))),
        s"uint value $v does not fit in $width byte(s)")
      Array.tabulate(width)(i => ((v >> (8 * (width - 1 - i))) & 0xff).toByte)
    }
    def floatBytes(d: Double): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d).array()

    val header = el(EbmlHeader,
      leaf(0x4286L, uintBytes(1, 1)) ++      // EBMLVersion
        leaf(0x42F7L, uintBytes(1, 1)) ++    // EBMLReadVersion
        leaf(0x42F2L, uintBytes(4, 1)) ++    // EBMLMaxIDLength
        leaf(0x42F3L, uintBytes(8, 1)) ++    // EBMLMaxSizeLength
        leaf(DocTypeId, meta.docType.getBytes("US-ASCII")) ++
        leaf(0x4287L, uintBytes(4, 1)) ++    // DocTypeVersion
        leaf(0x4285L, uintBytes(2, 1)),      // DocTypeReadVersion
      2)
    val info = el(InfoId,
      leaf(TimestampScaleId, uintBytes(meta.timestampScaleNs, 4)) ++
        leaf(DurationId, floatBytes(meta.durationTicks.toDouble)),
      2)
    require(meta.tracks.size <= 255,
      s"MKV encoder writes 1-byte TrackNumber/TrackUID fields: ${meta.tracks.size} tracks > 255")
    val trackEntries = meta.tracks.zipWithIndex.map { case (t, i) =>
      val typeByte = t.trackType match {
        case "video" => 1L
        case "audio" => 2L
        case other => throw new IllegalArgumentException(s"unsupported track type '$other'")
      }
      val media =
        if (t.trackType == "video")
          el(VideoId,
            leaf(PixelWidthId, uintBytes(t.width.toLong, 2)) ++
              leaf(PixelHeightId, uintBytes(t.height.toLong, 2)),
            1)
        else
          el(AudioId,
            leaf(SamplingFreqId, floatBytes(t.samplingHz.toDouble)) ++
              leaf(ChannelsId, uintBytes(t.channels.toLong, 1)),
            1)
      el(TrackEntryId,
        leaf(0xD7L, uintBytes(i + 1L, 1)) ++   // TrackNumber
          leaf(0x73C5L, uintBytes(i + 1L, 1)) ++ // TrackUID
          leaf(TrackTypeId, uintBytes(typeByte, 1)) ++
          leaf(CodecIdId, t.codec.getBytes("US-ASCII")) ++
          media,
        2)
    }
    val tracks = el(TracksId, trackEntries.flatten.toArray, 2)
    // a genuine SimpleBlock: track-number VINT (track 1), 16-bit
    // relative timestamp 0, keyframe flag, then the opaque payload
    val block = Array(0x81.toByte, 0.toByte, 0.toByte, 0x80.toByte) ++ payload
    val cluster = el(ClusterId,
      leaf(ClusterTimestampId, uintBytes(0L, 1)) ++ el(SimpleBlockId, block, 2),
      2)
    val segment = el(SegmentId, info ++ tracks ++ cluster, 8)
    header ++ segment
  }

  /** Parse an EBML tree and return the container-level Matroska
    * metadata. A real recursive EBML walker — variable-width element
    * IDs (1..4 bytes, marker-inclusive per RFC 8794), variable-width
    * size VINTs (1..8 bytes, marker stripped), the all-ones UNKNOWN
    * size (extends to the end of the enclosing element, as real
    * muxers emit for live Segments), and unknown-element skip —
    * FAILFAST on structural corruption (truncated VINT, size past the
    * enclosing element, over-wide integers), like every other decode
    * path here. Every leaf read is bounded inside its own element;
    * SimpleBlock payloads are not touched.
    */
  def decodeMkvMeta(bytes: Array[Byte]): MkvMeta = {
    var docType = ""
    var tsScale = 1000000L // Matroska default: 1 ms per tick
    var durationTicks = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[MkvTrack]
    var tType = 0L; var codec = ""; var w = 0; var h = 0
    var hz = 0L; var ch = 0

    def vintWidth(first: Int, max: Int, what: String): Int = {
      require(first != 0, s"invalid $what: first byte 0 (would be >8 bytes)")
      val width = java.lang.Integer.numberOfLeadingZeros(first) - 23
      require(width <= max, s"$what width $width exceeds $max bytes")
      width
    }
    // returns (value, nextOffset); for IDs the marker stays in the value
    def readId(off: Int, end: Int): (Long, Int) = {
      require(end - off >= 1, s"truncated element id at offset $off")
      val width = vintWidth(bytes(off) & 0xff, 4, "element id")
      require(end - off >= width, s"truncated element id at offset $off")
      var v = 0L
      var i = 0
      while (i < width) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
      (v, off + width)
    }
    // returns (size, nextOffset); size == -1 means UNKNOWN (all ones)
    def readSize(off: Int, end: Int): (Long, Int) = {
      require(end - off >= 1, s"truncated size vint at offset $off")
      val first = bytes(off) & 0xff
      val width = vintWidth(first, 8, "size vint")
      require(end - off >= width, s"truncated size vint at offset $off")
      var v = (first & (0xff >>> width)).toLong
      var i = 1
      while (i < width) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
      val allOnes = (1L << (7 * width)) - 1
      (if (v == allOnes) -1L else v, off + width)
    }
    def readUint(start: Int, len: Int, what: String): Long = {
      require(len >= 0 && len <= 8, s"$what: invalid uint length $len")
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (bytes(start + i) & 0xffL); i += 1 }
      v
    }
    def readFloat(start: Int, len: Int, what: String): Double = len match {
      case 0 => 0.0
      case 4 => java.lang.Float.intBitsToFloat(readUint(start, 4, what).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(readUint(start, 8, what))
      case n => throw new IllegalArgumentException(s"$what: invalid float length $n")
    }
    val masters = Set(SegmentId, InfoId, TracksId, TrackEntryId, VideoId, AudioId)

    def walk(start: Int, end: Int, depth: Int): Unit = {
      require(depth < 16, "element nesting too deep (corrupt container?)")
      var off = start
      while (off < end) {
        val (id, afterId) = readId(off, end)
        val (size0, cStart) = readSize(afterId, end)
        // UNKNOWN size (all ones) extends to the end of the enclosing
        // element — legal only on master elements per RFC 8794 §6.2
        if (size0 < 0)
          require(masters(id) || id == ClusterId || id == EbmlHeader,
            s"unknown size on non-master element 0x${id.toHexString} at $off")
        val size = if (size0 < 0) (end - cStart).toLong else size0
        require(cStart + size <= end,
          s"element 0x${id.toHexString} at $off claims $size bytes past its container")
        val cEnd = cStart + size.toInt
        val len = cEnd - cStart
        id match {
          case EbmlHeader => walk(cStart, cEnd, depth + 1)
          case DocTypeId =>
            // trailing NULs pad EBML strings per RFC 8794
            docType = new String(bytes, cStart, len, "US-ASCII").takeWhile(_ != '\u0000')
          case m if masters(m) =>
            if (id == TrackEntryId) {
              tType = 0L; codec = ""; w = 0; h = 0; hz = 0L; ch = 0
            }
            walk(cStart, cEnd, depth + 1)
            if (id == TrackEntryId) {
              val typeName = tType match {
                case 1 => "video"
                case 2 => "audio"
                case t => s"type$t"
              }
              tracks += MkvTrack(typeName, codec, w, h, hz, ch)
            }
          case TimestampScaleId => tsScale = readUint(cStart, len, "TimestampScale")
          case DurationId =>
            durationTicks = readFloat(cStart, len, "Duration").toLong
          case TrackTypeId => tType = readUint(cStart, len, "TrackType")
          case CodecIdId =>
            codec = new String(bytes, cStart, len, "US-ASCII").takeWhile(_ != '\u0000')
          case PixelWidthId => w = readUint(cStart, len, "PixelWidth").toInt
          case PixelHeightId => h = readUint(cStart, len, "PixelHeight").toInt
          case SamplingFreqId => hz = readFloat(cStart, len, "SamplingFrequency").toLong
          case ChannelsId => ch = readUint(cStart, len, "Channels").toInt
          case _ => // unknown element (Cluster payload, Void, ...): skip
        }
        off = cEnd
      }
    }
    walk(0, bytes.length, 0)
    require(docType.nonEmpty, "no EBML DocType: not a Matroska container")
    MkvMeta(docType, tsScale, durationTicks, tracks.toSeq)
  }
}
