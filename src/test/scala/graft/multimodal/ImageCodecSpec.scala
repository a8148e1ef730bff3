package graft.multimodal

import org.scalatest.funspec.AnyFunSpec

/** ImageCodec is the real-codec tier of the multimodal layer (m6): the
  * invariants here are exactly what the m6 oracle relies on — lossless
  * PNG pixel roundtrip, header-true dimensions for both formats, and
  * magic-byte mime sniffing.
  */
class ImageCodecSpec extends AnyFunSpec {

  private val data: Array[Byte] =
    (0 until 256).map(i => (i % 128).toByte).toArray

  describe("ImageCodec") {

    it("PNG roundtrips pixels exactly (lossless contract)") {
      val png = ImageCodec.encodePng(data, 12, 7)
      assert(ImageCodec.sniffMime(png) === "image/png")
      val d = ImageCodec.decode(png).get
      assert(d.mime === "image/png")
      assert(d.width === 12)
      assert(d.height === 7)
      // the decoded-pixel digest equals the digest of the source bytes:
      // the identity the m6 oracle checks from DuckDB's side
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(data.take(12 * 7))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(d.pixMd5 === expect)
    }

    it("JPEG decodes with header-true dimensions and null pixel digest") {
      val jpg = ImageCodec.encodeJpeg(data, 9, 5)
      assert(ImageCodec.sniffMime(jpg) === "image/jpeg")
      val d = ImageCodec.decode(jpg).get
      assert(d.mime === "image/jpeg")
      assert(d.width === 9)
      assert(d.height === 5)
      assert(d.pixMd5 == null,
        "JPEG is lossy — a pixel digest would be decoder-version-dependent")
    }

    it("rejects rasters larger than the payload") {
      assertThrows[IllegalArgumentException] {
        ImageCodec.encodePng(data, 64, 64)
      }
    }

    it("returns None for undecodable bytes; sniff falls back to octet-stream") {
      val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
      assert(ImageCodec.sniffMime(junk) === "application/octet-stream")
      assert(ImageCodec.decode(junk).isEmpty)
    }

    it("decodePixelsPng recovers the raster; rejects non-PNG") {
      val png = ImageCodec.encodePng(data, 12, 7)
      val (w, h, px) = ImageCodec.decodePixelsPng(png).get
      assert((w, h) === (12, 7))
      assert(java.util.Arrays.equals(px, data.take(12 * 7)))
      val jpg = ImageCodec.encodeJpeg(data, 12, 7)
      assert(ImageCodec.decodePixelsPng(jpg).isEmpty,
        "lossy formats are excluded from pixel recovery by contract")
    }

    it("resizeNearest selects source pixels by exact floor arithmetic") {
      // 4x2 raster downscaled to 2x1: (tx,ty)=(0,0) -> src (0*4/2, 0*2/1)
      // = (0,0); (1,0) -> (1*4/2, 0) = (2,0)
      val src = Array[Byte](10, 11, 12, 13, 20, 21, 22, 23)
      assert(ImageCodec.resizeNearest(src, 4, 2, 2, 1).toSeq ===
        Seq[Byte](10, 12))
      // upscale 2x1 -> 4x2: each target samples (tx*2/4, ty*1/2)
      val small = Array[Byte](5, 9)
      assert(ImageCodec.resizeNearest(small, 2, 1, 4, 2).toSeq ===
        Seq[Byte](5, 5, 9, 9, 5, 5, 9, 9))
      // identity resize is the identity
      assert(ImageCodec.resizeNearest(src, 4, 2, 4, 2).toSeq === src.toSeq)
    }

    it("resizeNearest composed with the PNG roundtrip matches direct " +
       "selection from the source bytes (the m7 oracle identity)") {
      val w = 13; val h = 9; val tw = 8; val th = 6
      val png = ImageCodec.encodePng(data, w, h)
      val (dw, dh, px) = ImageCodec.decodePixelsPng(png).get
      val thumb = ImageCodec.resizeNearest(px, dw, dh, tw, th)
      val expect = for (ty <- 0 until th; tx <- 0 until tw)
        yield data((ty * h / th) * w + tx * w / tw)
      assert(thumb.toSeq === expect)
    }

    it("resizeNearest selection law holds under random dims (20 seeded cases)") {
      val rnd = new scala.util.Random(11)
      (1 to 20).foreach { _ =>
        val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(12)
        val tw = 1 + rnd.nextInt(20); val th = 1 + rnd.nextInt(12)
        val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
        val out = ImageCodec.resizeNearest(px, w, h, tw, th)
        for (ty <- 0 until th; tx <- 0 until tw)
          assert(out(ty * tw + tx) === px((ty * h / th) * w + tx * w / tw),
            s"${w}x$h -> ${tw}x$th at ($tx,$ty)")
      }
    }

    it("encode is deterministic (same bytes in, same container bytes out)") {
      val a = ImageCodec.encodePng(data, 8, 8)
      val b = ImageCodec.encodePng(data, 8, 8)
      assert(java.util.Arrays.equals(a, b))
      val ja = ImageCodec.encodeJpeg(data, 8, 8)
      val jb = ImageCodec.encodeJpeg(data, 8, 8)
      assert(java.util.Arrays.equals(ja, jb))
    }

    it("aHash: hand-computed 2x2 case, strict-mean bit rule, hex packing") {
      // a 2x2 "image" hashed at its own size (no resize): values
      // 10, 20, 30, 40 -> mean 25 -> bits (row-major) 0,0,1,1 -> one
      // nibble 0b0011 = '3'; popcount 2
      val (h1, p1) = ImageCodec.aHash(Array[Byte](10, 20, 30, 40), 2, 2, 2, 2)
      assert(h1 === "3" && p1 === 2)
      // STRICT compare: a flat image has every v*n == sum -> all bits 0
      val (h2, p2) = ImageCodec.aHash(Array.fill(4)(42.toByte), 2, 2, 2, 2)
      assert(h2 === "0" && p2 === 0)
      // high bytes are unsigned (0xff = 255, not -1)
      val (h3, p3) =
        ImageCodec.aHash(Array[Byte](0, 0, 0, 0xff.toByte), 2, 2, 2, 2)
      assert(h3 === "1" && p3 === 1)
    }

    it("aHash survives the PNG roundtrip (the m9 path end-to-end)") {
      val rnd = new scala.util.Random(7)
      val raw = Array.fill(256)(rnd.nextInt(256).toByte)
      val direct = ImageCodec.aHash(raw, 16, 16, 8, 8)
      val png = ImageCodec.encodePng(raw, 16, 16)
      val Some((w, h, px)) = ImageCodec.decodePixelsPng(png)
      assert((w, h) === (16, 16))
      assert(ImageCodec.aHash(px, w, h, 8, 8) === direct)
      assert(direct._1.length === 16)
    }
  }
}
