package graft.multimodal

/** Compressed-container METADATA codecs — the real half of the stub tier.
  *
  * The container ships no ffmpeg, so mp3/mp4 DECODE stays behind
  * `Multimodal.decodeStub` (the documented constraint). But a training-
  * data pipeline's first pass over compressed media is not decode — it
  * is container validation and metadata extraction (duration, bitrate,
  * track inventory: what dedup shards on, what quota mixing filters by,
  * what a corrupt-asset filter rejects on). That pass needs only the
  * container FORMAT, which is public byte layout, not a codec:
  *
  *  - MP3: MPEG-1 Layer III frame headers — 11-bit sync, version/layer
  *    bits, bitrate/samplerate indices, padding; frame length =
  *    144000·kbps/hz + pad, 1152 samples per frame (ISO 11172-3).
  *    [[parseMp3]] sync-scans and walks frame to frame.
  *  - MP4: ISO BMFF length-prefixed box tree — ftyp major brand, moov →
  *    mvhd timescale/duration, trak count, mdat payload bytes
  *    (ISO 14496-12). [[parseMp4]] walks top-level and moov-child boxes.
  *
  * Same oracle design as ImageCodec/AudioCodec: the engine SYNTHESIZES
  * spec-valid containers from table bytes with parameters that are
  * deterministic functions of the row ([[encodeMp3]]/[[encodeMp4]]), so
  * a codec-less DuckDB oracle pins every parsed value analytically while
  * the Spark side must recover them from the actual container bytes.
  * Everything runs inside mapPartitions (the sanctioned kernel tier) —
  * one pass, no allocation proportional to payload count.
  */
object ContainerMeta {

  // ---- MP3 ----------------------------------------------------------

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free and
    * 15 = bad are never synthesized and rejected by the parser.
    */
  val Mp3BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)

  /** MPEG-1 samplerate table (Hz), index 0..2; 3 is reserved. */
  val Mp3SampleRateHz: Array[Int] = Array(44100, 48000, 32000, -1)

  val Mp3SamplesPerFrame = 1152

  private def mp3FrameLen(kbps: Int, hz: Int, padding: Int): Int =
    144000 * kbps / hz + padding

  /** Synthesize `nFrames` spec-valid MPEG-1 Layer III frames: header
    * fields from the given table indices (constant across frames, no
    * padding — CBR), frame bodies filled from `data` cyclically. The
    * parser below must recover (nFrames, kbps, hz) from these bytes.
    */
  def encodeMp3(data: Array[Byte], nFrames: Int, bitrateIdx: Int,
                srIdx: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrateIdx $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"srIdx $srIdx")
    require(nFrames >= 1, s"nFrames $nFrames")
    val kbps = Mp3BitrateKbps(bitrateIdx)
    val hz = Mp3SampleRateHz(srIdx)
    val frameLen = mp3FrameLen(kbps, hz, 0)
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      val o = f * frameLen
      out(o) = 0xff.toByte                       // sync 11111111
      out(o + 1) = 0xfb.toByte                   // sync+MPEG1+LayerIII+noCRC
      out(o + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte // no padding
      out(o + 3) = 0xc0.toByte                   // mono, no ext/copy/orig
      var i = 4
      while (i < frameLen) {
        // body bytes from the source data, cyclic; never 0xFF so a body
        // byte can't alias a sync word mid-frame (the parser skips by
        // computed frame length anyway — this keeps resync-style parsers
        // honest too)
        val b = if (data.length == 0) 0 else data((o + i) % data.length) & 0x7f
        out(o + i) = b.toByte
        i += 1
      }
      f += 1
    }
    out
  }

  /** Parsed MP3 container metadata (first-frame header parameters; CBR
    * streams — the synthesized contract — keep them constant).
    */
  final case class Mp3Meta(nFrames: Long, kbps: Long, hz: Long,
                           samples: Long)

  /** Sync-scan + frame-walk. Returns None when no valid MPEG-1 Layer III
    * sync is found at offset 0 or any header field is reserved/invalid —
    * the corrupt-asset signal a media-ingest filter keys on.
    */
  def parseMp3(payload: Array[Byte]): Option[Mp3Meta] = {
    var pos = 0
    var frames = 0L
    var kbps = -1
    var hz = -1
    while (pos + 4 <= payload.length) {
      val b0 = payload(pos) & 0xff
      val b1 = payload(pos + 1) & 0xff
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) // sync + MPEG1 + Layer III
        return if (frames > 0 && pos == payload.length) mk(frames, kbps, hz)
               else None
      val b2 = payload(pos + 2) & 0xff
      val bi = b2 >>> 4
      val si = (b2 >>> 2) & 0x3
      if (bi < 1 || bi > 14 || si > 2) return None
      val k = Mp3BitrateKbps(bi)
      val h = Mp3SampleRateHz(si)
      if (frames == 0L) { kbps = k; hz = h }
      else if (k != kbps || h != hz) return None // CBR contract
      val pad = (b2 >>> 1) & 0x1
      pos += mp3FrameLen(k, h, pad)
      frames += 1
    }
    if (frames > 0 && pos == payload.length) mk(frames, kbps, hz) else None
  }

  private def mk(frames: Long, kbps: Int, hz: Int): Option[Mp3Meta] =
    Some(Mp3Meta(frames, kbps.toLong, hz.toLong,
      frames * Mp3SamplesPerFrame))

  // ---- MP4 (ISO BMFF) -------------------------------------------------

  /** Synthesize a minimal spec-valid ISO BMFF file:
    * ftyp(major, minor=0, compat=major) + moov(mvhd(timescale, duration)
    * + nTraks empty trak boxes) + mdat(data). The parser below must
    * recover (major, timescale, duration, nTraks, mdatBytes).
    */
  def encodeMp4(data: Array[Byte], major: String, timescale: Int,
                duration: Long, nTraks: Int): Array[Byte] = {
    require(major.length == 4, s"major brand must be 4 chars: '$major'")
    // v0 mvhd carries a 32-bit duration; a wider value would silently
    // truncate through be32 and the round-trip would disagree with the
    // caller (ADVICE r12) — refuse rather than emit a wrong container
    require(nTraks >= 0 && timescale > 0 &&
      duration >= 0 && duration <= 0xFFFFFFFFL,
      s"v0 mvhd duration must fit 32 bits unsigned: $duration")
    val bb = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      bb.write((v >>> 24) & 0xff); bb.write((v >>> 16) & 0xff)
      bb.write((v >>> 8) & 0xff); bb.write(v & 0xff)
    }
    def tag(t: String): Unit =
      bb.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // ftyp: size(4) type(4) major(4) minor(4) compat(4) = 20
    be32(20); tag("ftyp"); tag(major); be32(0); tag(major)
    // mvhd v0: size(4) type(4) ver+flags(4) ctime(4) mtime(4)
    //          timescale(4) duration(4) = 28 (trailing rate/volume/matrix
    //          fields omitted — box SIZE governs the walk, per BMFF)
    val mvhdSize = 28
    val trakSize = 8
    val moovSize = 8 + mvhdSize + nTraks * trakSize
    be32(moovSize); tag("moov")
    be32(mvhdSize); tag("mvhd"); be32(0); be32(0); be32(0)
    be32(timescale); be32(duration.toInt)
    var i = 0
    while (i < nTraks) { be32(trakSize); tag("trak"); i += 1 }
    be32(8 + data.length); tag("mdat"); bb.write(data, 0, data.length)
    bb.toByteArray
  }

  final case class Mp4Meta(major: String, timescale: Long, duration: Long,
                           nTraks: Long, mdatBytes: Long)

  /** Top-level + moov-child box walk. None on a malformed tree (box
    * overruns the payload, zero-size box, missing ftyp/moov/mvhd).
    */
  def parseMp4(payload: Array[Byte]): Option[Mp4Meta] = {
    def be32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def tagAt(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var pos = 0
    var major: String = null
    var timescale = -1L
    var duration = -1L
    var traks = 0L
    var mdat = -1L
    while (pos + 8 <= payload.length) {
      val size = be32(pos)
      if (size < 8 || pos + size > payload.length) return None
      tagAt(pos + 4) match {
        case "ftyp" if size >= 16 => major = tagAt(pos + 8)
        case "moov" =>
          var c = pos + 8
          val end = pos + size.toInt
          while (c + 8 <= end) {
            val cs = be32(c)
            if (cs < 8 || c + cs > end) return None
            tagAt(c + 4) match {
              case "mvhd" if cs >= 28 =>
                // v0 layout from box start: size(4) type(4) ver+flags(4)
                // ctime(4) mtime(4) → timescale at +20, duration at +24
                timescale = be32(c + 20)
                duration = be32(c + 24)
              case "trak" => traks += 1
              case _ =>
            }
            c += cs.toInt
          }
        case "mdat" => mdat = size - 8
        case _ =>
      }
      pos += size.toInt
    }
    if (pos != payload.length || major == null || timescale < 0 ||
        mdat < 0) None
    else Some(Mp4Meta(major, timescale, duration, traks, mdat))
  }
}
