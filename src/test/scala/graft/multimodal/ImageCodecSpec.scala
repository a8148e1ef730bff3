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

    it("encode is deterministic (same bytes in, same container bytes out)") {
      val a = ImageCodec.encodePng(data, 8, 8)
      val b = ImageCodec.encodePng(data, 8, 8)
      assert(java.util.Arrays.equals(a, b))
      val ja = ImageCodec.encodeJpeg(data, 8, 8)
      val jb = ImageCodec.encodeJpeg(data, 8, 8)
      assert(java.util.Arrays.equals(ja, jb))
    }
  }
}
