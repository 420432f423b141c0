package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden-vector pins for the audio_header_meta decoder (r15): the
  * mm_audio_meta gate proves encode∘decode round-trips on planted
  * payloads, but a matching bug in both directions (e.g. both sides
  * big-endian) would slip through it — these vectors are
  * hand-assembled from the PUBLISHED layout (the Microsoft/IBM RIFF
  * WAVE spec; format registry RFC 2361) so the decoder is checked
  * against the format itself, not against our own encoder.
  */
class AudioHeaderSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def decode(hex: String): Row = {
    val df = spark.sql(
      s"SELECT audio_header_meta(unhex('$hex')) AS m")
    df.select("m.format", "m.channels", "m.sample_rate",
      "m.bits_per_sample", "m.n_frames").head()
  }

  private def decodeNull(hex: String): Boolean =
    spark.sql(s"SELECT audio_header_meta(unhex('$hex')) AS m")
      .head().isNullAt(0)

  test("the canonical 44-byte WAV header: mono 8 kHz 8-bit, 4 samples") {
    val hex = "52494646" + "28000000" + "57415645" + // RIFF 40 WAVE
      "666D7420" + "10000000" +                       // fmt  16
      "0100" + "0100" + "401F0000" + "401F0000" +     // pcm, 1ch, 8000, 8000
      "0100" + "0800" +                               // align 1, bits 8
      "64617461" + "04000000" + "80808080"            // data 4 + samples
    decode(hex) shouldBe Row("wav", 1, 8000, 8, 4L)
  }

  test("CD-style stereo 16-bit 44.1 kHz: 2 frames") {
    val hex = "52494646" + "2C000000" + "57415645" +
      "666D7420" + "10000000" +
      "0100" + "0200" + "44AC0000" + "10B10200" +     // 2ch, 44100, 176400
      "0400" + "1000" +                               // align 4, bits 16
      "64617461" + "08000000" + "00" * 8
    decode(hex) shouldBe Row("wav", 2, 44100, 16, 2L)
  }

  test("a fixed-offset parser would fail: LIST chunk shifts fmt/data") {
    // same fmt/data planted after LIST chunks of different sizes —
    // the walk must skip each by its declared little-endian size
    def wav(pad: Int): String =
      "52494646" + f"${40 + 8 + pad}%02X000000" + "57415645" +
        "4C495354" + f"$pad%02X000000" + "41" * pad +
        "666D7420" + "10000000" +
        "0100" + "0100" + "401F0000" + "401F0000" + "0100" + "0800" +
        "64617461" + "04000000" + "80808080"
    decode(wav(4)) shouldBe Row("wav", 1, 8000, 8, 4L)
    decode(wav(12)) shouldBe Row("wav", 1, 8000, 8, 4L)
  }

  test("odd-size chunks carry a RIFF pad byte the walk must honor") {
    // a 3-byte LIST payload is padded to 4; misreading the pad rule
    // desynchronizes the walk and the fmt tag is never seen
    val hex = "52494646" + "30000000" + "57415645" +
      "4C495354" + "03000000" + "414141" + "00" + // 3 + pad
      "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "401F0000" + "0100" + "0800" +
      "64617461" + "04000000"
    decode(hex) shouldBe Row("wav", 1, 8000, 8, 4L)
  }

  test("declared data size suffices without the payload (probe semantics)") {
    val hex = "52494646" + "24080000" + "57415645" +
      "666D7420" + "10000000" +
      "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000" +
      "64617461" + "00080000" // 2048 bytes declared, none present
    decode(hex) shouldBe Row("wav", 2, 44100, 16, 512L)
  }

  test("rejects: bad magic, truncated fmt, zero block align, no data") {
    decodeNull("00112233445566778899AABB") shouldBe true
    decodeNull("52494646" + "04000000" + "57415645") shouldBe true // no chunks
    // fmt declared but truncated
    decodeNull("52494646" + "10000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0100") shouldBe true
    // zero block align would divide by zero downstream — rejected
    decodeNull("52494646" + "28000000" + "57415645" +
      "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "401F0000" + "0000" + "0800" +
      "64617461" + "04000000") shouldBe true
    // fmt present, data chunk never appears
    decodeNull("52494646" + "18000000" + "57415645" +
      "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "401F0000" + "0100" + "0800") shouldBe true
  }
}
