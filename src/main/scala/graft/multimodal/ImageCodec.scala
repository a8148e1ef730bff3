package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO

/** Real PNG/JPEG image codec on `javax.imageio` — zero external
  * dependencies, pure JVM (VERDICT r8 item 4: the decode stub's container
  * constraint doesn't apply to these two formats). `Multimodal.decodeStub`
  * remains only for formats the JVM genuinely cannot decode (video,
  * audio).
  *
  * Design for oracle-checkability: the engine ENCODES deterministic
  * grayscale images from raw table bytes (pixel k = byte k of the text,
  * row-major), ships them as opaque binary payloads, then DECODES and
  * extracts features. Width/height come from the real decoder parsing
  * the real container header (PNG IHDR / JPEG SOF), and for lossless PNG
  * the recovered pixel bytes are digest-compared — so a DuckDB oracle
  * with no image codec can still pin every output analytically (it knows
  * which bytes were encoded). JPEG is lossy: its pixel digest is null by
  * contract; its width/height remain decoder-true assertions.
  *
  * Everything here runs inside `mapPartitions` (the engine's sanctioned
  * per-partition kernel tier, same as ParityScorer): one codec instance
  * pipeline per task, no driver involvement, scales with partitions.
  */
object ImageCodec {

  // ImageIO's DEFAULT ImageInputStream spools every read/write through a
  // DISK-cache temp file — one create+delete per image, a per-row cost
  // that serializes on filesystem metadata at kernel thread counts (the
  // same per-call-JDK-service trap as AudioCodec's provider registry).
  // Payloads here are small in-memory byte arrays, so every read/write
  // below passes an EXPLICIT MemoryCacheImage{Input,Output}Stream instead
  // of flipping the JVM-global `ImageIO.setUseCache(false)` (ADVICE r11:
  // the global flag silently changed behavior for every other ImageIO
  // user in the process as a lazy side effect of touching this object).
  private def memIn(payload: Array[Byte]): javax.imageio.stream.ImageInputStream =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload))

  /** 8-bit grayscale PNG of the first w*h bytes of `data` (row-major). */
  def encodePng(data: Array[Byte], w: Int, h: Int): Array[Byte] =
    encode(data, w, h, "png")

  /** 8-bit grayscale JPEG (default quality) of the same raster. */
  def encodeJpeg(data: Array[Byte], w: Int, h: Int): Array[Byte] =
    encode(data, w, h, "jpg")

  private def encode(data: Array[Byte], w: Int, h: Int,
                     format: String): Array[Byte] = {
    require(data.length >= w * h,
      s"payload ${data.length} B too short for ${w}x$h raster")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, data(i) & 0xff)
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val ok = ImageIO.write(img, format, ios)
      require(ok, s"no ImageIO writer for $format")
    } finally ios.close() // flushes the memory cache into bos
    bos.toByteArray
  }

  /** Decoded image features: container-sniffed mime, header-true
    * dimensions, and (lossless formats only) the md5 of the recovered
    * gray pixel bytes in row-major order.
    */
  final case class Decoded(mime: String, width: Int, height: Int,
                           pixMd5: String)

  /** Magic-byte mime sniff — the payload is opaque binary; its mime is a
    * property of the bytes, not of trusted metadata.
    */
  def sniffMime(payload: Array[Byte]): String =
    if (payload.length >= 8 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G') "image/png"
    else if (payload.length >= 3 &&
        (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
        (payload(2) & 0xff) == 0xff) "image/jpeg"
    else "application/octet-stream"

  /** Decode a payload. Returns None when no JVM reader accepts the bytes
    * (the caller decides whether that's a data error or a stub-tier
    * format). pixMd5 is null for lossy formats — JPEG pixels are not
    * bit-recoverable and a digest over them would be decoder-version-
    * dependent.
    */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    val mime = sniffMime(payload)
    val img = ImageIO.read(memIn(payload))
    if (img == null) None
    else {
      val md5 =
        if (mime == "image/png") {
          val w = img.getWidth; val h = img.getHeight
          val bytes = new Array[Byte](w * h)
          val raster = img.getRaster
          var i = 0
          while (i < w * h) {
            bytes(i) = raster.getSample(i % w, i / w, 0).toByte
            i += 1
          }
          hexMd5(bytes)
        } else null
      Some(Decoded(mime, img.getWidth, img.getHeight, md5))
    }
  }

  /** Lossless pixel recovery for PNG payloads: (width, height, row-major
    * gray bytes). None when the bytes aren't a decodable PNG — lossy
    * formats are deliberately excluded (their pixels are not
    * bit-recoverable, so any downstream digest/resize over them would be
    * decoder-version-dependent).
    */
  def decodePixelsPng(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (sniffMime(payload) != "image/png") None
    else Option(ImageIO.read(memIn(payload))).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val bytes = new Array[Byte](w * h)
      val raster = img.getRaster
      var i = 0
      while (i < w * h) {
        bytes(i) = raster.getSample(i % w, i / w, 0).toByte
        i += 1
      }
      (w, h, bytes)
    }

  /** Nearest-neighbor resize of a row-major gray raster: target pixel
    * (tx, ty) samples source (tx*w/tw, ty*h/th) — exact integer floor
    * arithmetic (works for both up- and down-scaling), so the output is
    * a pure byte SELECTION from the source raster that a codec-less
    * oracle can reproduce analytically. No interpolation by design:
    * averaged pixels would be float-rounding-dependent.
    */
  def resizeNearest(px: Array[Byte], w: Int, h: Int,
                    tw: Int, th: Int): Array[Byte] = {
    require(w > 0 && h > 0 && tw > 0 && th > 0,
      s"resizeNearest needs positive dims, got ${w}x$h -> ${tw}x$th")
    require(px.length >= w * h, s"raster ${px.length} B too short for ${w}x$h")
    val out = new Array[Byte](tw * th)
    var ty = 0
    while (ty < th) {
      val sy = ty * h / th
      var tx = 0
      while (tx < tw) {
        out(ty * tw + tx) = px(sy * w + tx * w / tw)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Row-major md5 hex digest — shared by decode() and the resize path. */
  def hexMd5(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Perceptual average-hash (aHash) over a gray raster: NN-downsample to
    * tw×th ([[resizeNearest]] — exact integer floor selection, so a
    * codec-less oracle reproduces the same pixel picks), then one bit per
    * cell: pixel strictly above the cell mean. The mean compare is kept
    * integer-exact (`v × n > Σv` instead of `v > Σv/n`) so no float ever
    * enters the hash. Bits pack row-major MSB-first into hex nibbles
    * (tw×th must be a multiple of 4). Returns (hex hash, popcount).
    *
    * This is the image near-dup FEATURE of a multimodal pipeline: equal
    * or hamming-close hashes mark visually-identical assets after
    * re-encoding/resizing, and the hex prefix is the band key a
    * bucketed near-dup join blocks on (the t4/t8 SimHash shape, image
    * side).
    */
  def aHash(px: Array[Byte], w: Int, h: Int,
            tw: Int = 8, th: Int = 8): (String, Int) = {
    val n = tw * th
    require(n % 4 == 0, s"aHash bit count $n must pack into hex nibbles")
    val sel = resizeNearest(px, w, h, tw, th)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (sel(i) & 0xff); i += 1 }
    val bits = new Array[Int](n)
    var pop = 0
    i = 0
    while (i < n) {
      if ((sel(i) & 0xff).toLong * n > sum) { bits(i) = 1; pop += 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n / 4)
    var j = 0
    while (j < n / 4) {
      val nib = bits(4 * j) * 8 + bits(4 * j + 1) * 4 +
        bits(4 * j + 2) * 2 + bits(4 * j + 3)
      sb.append("0123456789abcdef".charAt(nib))
      j += 1
    }
    (sb.toString, pop)
  }
}
