package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden-vector pins for the img_header_meta decoder (r14): the
  * mm_decode_dims gate proves encode∘decode round-trips on planted
  * payloads, but a matching bug in both directions (e.g. both sides
  * little-endian) would slip through it — these vectors are
  * hand-assembled from the PUBLISHED byte layouts (RFC 2083 §3.1,
  * ISO/IEC 10918-1 Annex B) so the decoder is checked against the
  * formats themselves, not against our own encoder.
  */
class ImageHeaderSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def decode(hex: String): Row = {
    val df = spark.sql(
      s"SELECT img_header_meta(unhex('$hex')) AS m")
    df.select("m.format", "m.width", "m.height", "m.bit_depth").head()
  }

  private def decodeNull(hex: String): Boolean =
    spark.sql(s"SELECT img_header_meta(unhex('$hex')) AS m")
      .head().isNullAt(0)

  test("PNG: real 1x1 RGBA header (the canonical tiny PNG)") {
    // signature + IHDR(len 13) + width=1, height=1, depth=8, color 6,
    // then the real CRC bytes 1F15C489 from the well-known 1x1 png
    val hex = "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000001" + "00000001" + "08" + "06" + "000000" + "1F15C489"
    decode(hex) shouldBe Row("png", 1, 1, 8)
  }

  test("PNG: 16-bit grayscale 640x480") {
    val hex = "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "10" + "00" + "000000" + "00000000"
    decode(hex) shouldBe Row("png", 640, 480, 16)
  }

  test("JPEG: SOI, APP0, variable COM, SOF0 — segment walk required") {
    // SOI | APP0 len 16 (JFIF) | COM len 9 (7 payload bytes) |
    // SOF0 len 17: precision 8, height 0x005A=90, width 0x00A0=160
    val hex = "FFD8" +
      "FFE00010" + "4A46494600010100004800480000" +
      "FFFE0009" + "41" * 7 +
      "FFC00011" + "08" + "005A" + "00A0" + "03" +
      "011100" + "021101" + "031101" + "FFD9"
    decode(hex) shouldBe Row("jpeg", 160, 90, 8)
  }

  test("JPEG: progressive (SOF2) with a fill byte before the marker") {
    val hex = "FFD8" + "FF" + // fill byte
      "FFC2000B" + "08" + "0100" + "0200" + "01" + "011100"
    decode(hex) shouldBe Row("jpeg", 512, 256, 8)
  }

  test("JPEG: every SOFn variant is a frame header; DHT/JPG/DAC are not") {
    // ADVICE r14 #1: lossless (SOF3), arithmetic (SOF9) and
    // differential (SOF13) JPEGs share the SOF layout and must decode
    def sof(m: Int): String =
      "FFD8" + f"FF$m%02X" + "000B" + "10" + "0040" + "0080" + "01" + "011100"
    for (m <- Seq(0xc3, 0xc5, 0xc6, 0xc7, 0xc9, 0xca, 0xcb, 0xcd, 0xce, 0xcf))
      decode(sof(m)) shouldBe Row("jpeg", 128, 64, 16)
    // DHT (0xC4) sits in the SOFn range but is NOT a frame header —
    // the walk must step over it by its length and reach the real SOF0
    val viaDht = "FFD8" + "FFC40005" + "00" * 3 +
      "FFC0000B" + "08" + "0020" + "0030" + "01" + "011100"
    decode(viaDht) shouldBe Row("jpeg", 48, 32, 8)
  }

  test("rejects: bad signature, truncation, EOI before SOF, corrupt length") {
    decodeNull("00112233445566778899") shouldBe true // neither format
    decodeNull("89504E470D0A1A0A0000000D494844") shouldBe true // cut IHDR
    decodeNull("FFD8FFD9") shouldBe true // EOI with no frame header
    decodeNull("FFD8FFFE0001FFC00011") shouldBe true // COM length < 2
    // PNG whose first chunk is not IHDR (spec violation)
    decodeNull("89504E470D0A1A0A" + "0000000D" + "69484452" +
      "00000001" + "00000001" + "08" + "06" + "000000" + "00000000") shouldBe true
  }

  test("a fixed-offset parser would fail: same dims, shifted SOF") {
    // two COM paddings of different lengths, same frame header — the
    // decoder must find SOF at different offsets and agree
    def jpeg(pad: Int): String =
      "FFD8" + "FFFE" + f"${pad + 2}%04X" + "42" * pad +
        "FFC00011" + "08" + "0168" + "0280" + "03" +
        "011100" + "021101" + "031101" + "FFD9"
    decode(jpeg(3)) shouldBe Row("jpeg", 640, 360, 8)
    decode(jpeg(11)) shouldBe Row("jpeg", 640, 360, 8)
  }
}
