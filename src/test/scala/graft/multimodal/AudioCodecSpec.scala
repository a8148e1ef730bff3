package graft.multimodal

import org.scalatest.funspec.AnyFunSpec

/** AudioCodec is the audio half of the real-codec tier (m8): the
  * invariants here are what the m8 oracle relies on — lossless PCM
  * sample roundtrip through a real WAV container, fmt-chunk-true format
  * fields, and magic-byte mime sniffing.
  */
class AudioCodecSpec extends AnyFunSpec {

  private val data: Array[Byte] =
    (0 until 256).map(i => ((i * 7) % 256).toByte).toArray

  describe("AudioCodec") {

    it("WAV roundtrips samples exactly (lossless PCM contract)") {
      val wav = AudioCodec.encodeWav(data, 200, 11000)
      assert(AudioCodec.sniffMime(wav) === "audio/wav")
      val d = AudioCodec.decodeWav(wav).get
      assert(d.mime === "audio/wav")
      assert(d.sampleRate === 11000)
      assert(d.channels === 1)
      assert(d.bits === 8)
      assert(d.nFrames === 200L)
      // decoded-sample digest equals the digest of the source bytes —
      // the identity the m8 oracle checks from DuckDB's side
      assert(d.pcmMd5 === ImageCodec.hexMd5(data.take(200)))
    }

    it("decodeWavPcm hands back the raw sample bytes verbatim (the m11 " +
      "feature kernel's input), and decodeWav is exactly it minus samples") {
      val wav = AudioCodec.encodeWav(data, 200, 9000)
      val (d, pcm) = AudioCodec.decodeWavPcm(wav).get
      assert(pcm.toSeq === data.take(200).toSeq)
      assert(AudioCodec.decodeWav(wav).get === d)
      // cached-provider path returns None on junk exactly like before
      assert(AudioCodec.decodeWavPcm("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
    }

    it("a one-frame payload is valid (the n >= 1 filter boundary)") {
      val wav = AudioCodec.encodeWav(data, 1, 8000)
      val d = AudioCodec.decodeWav(wav).get
      assert(d.nFrames === 1L)
      assert(d.pcmMd5 === ImageCodec.hexMd5(data.take(1)))
    }

    it("rejects empty payloads and non-positive rates") {
      assertThrows[IllegalArgumentException] {
        AudioCodec.encodeWav(data, 0, 8000)
      }
      assertThrows[IllegalArgumentException] {
        AudioCodec.encodeWav(data, 10, 0)
      }
    }

    it("returns None for undecodable bytes; sniff falls back to octet-stream") {
      val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
      assert(AudioCodec.sniffMime(junk) === "application/octet-stream")
      assert(AudioCodec.decodeWav(junk).isEmpty)
    }

    it("encode is deterministic (same bytes in, same container bytes out)") {
      val a = AudioCodec.encodeWav(data, 128, 9000)
      val b = AudioCodec.encodeWav(data, 128, 9000)
      assert(java.util.Arrays.equals(a, b))
    }

    it("roundtrips under random n/rate (20 seeded cases)") {
      val rnd = new scala.util.Random(7)
      (1 to 20).foreach { _ =>
        val n = 1 + rnd.nextInt(data.length)
        val rate = 4000 + rnd.nextInt(44100)
        val d = AudioCodec.decodeWav(AudioCodec.encodeWav(data, n, rate)).get
        assert(d.sampleRate === rate)
        assert(d.nFrames === n.toLong)
        assert(d.pcmMd5 === ImageCodec.hexMd5(data.take(n)), s"n=$n rate=$rate")
      }
    }

    it("µ-law decode matches the G.711 expansion formula for all 256 " +
       "codes (the m15 oracle's premise)") {
      // the SQL oracle computes ulaw2linear analytically; the engine
      // decodes through the JDK's UlawCodec — this pins them bit-equal
      def ulaw2linear(c: Int): Int = {
        val u = ~c & 0xff
        val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
        if ((u & 0x80) != 0) 0x84 - t else t - 0x84
      }
      val codes = (0 until 256).map(_.toByte).toArray
      val wav = AudioCodec.encodeUlawWav(codes, 256, 8000)
      val d = AudioCodec.decodeUlawWav(wav).get
      assert(d.srcEncoding === "ULAW")
      assert(d.nFrames === 256L)
      assert(d.bits === 16 && d.channels === 1 && d.sampleRate === 8000)
      val expected = ImageCodec.hexMd5(
        (0 until 256).map(c => ulaw2linear(c)).mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      assert(d.pcmMd5 === expected,
        "JDK ULAW codec diverges from the G.711 formula")
    }

    it("µ-law decode rejects a PCM WAV and corrupt payloads (Option " +
       "fence)") {
      val pcmWav = AudioCodec.encodeWav(data, 64, 8000)
      assert(AudioCodec.decodeUlawWav(pcmWav).isEmpty)
      val ulaw = AudioCodec.encodeUlawWav(data, 64, 8000)
      assert(AudioCodec.decodeUlawWav(ulaw.dropRight(10)).isEmpty)
      assert(AudioCodec.decodeUlawWav("nope".getBytes).isEmpty)
    }
  }
}
