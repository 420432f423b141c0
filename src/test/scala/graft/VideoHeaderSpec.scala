package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden-vector pins for the video_header_meta decoder (r15): the
  * mm_video_meta gate proves encode∘decode round-trips on planted
  * payloads; these vectors are hand-assembled from the PUBLISHED ISO
  * base-media layout (ISO/IEC 14496-12 §4.2 box structure, §8.2.2
  * mvhd) so the decoder is checked against the format itself —
  * including the size==1 64-bit largesize escape, the size==0
  * to-EOF rule, and the mvhd version-1 64-bit field layout, none of
  * which the gate's v0 plants exercise.
  */
class VideoHeaderSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def decode(hex: String): Row = {
    val df = spark.sql(
      s"SELECT video_header_meta(unhex('$hex')) AS m")
    df.select("m.format", "m.brand", "m.timescale", "m.duration").head()
  }

  private def decodeNull(hex: String): Boolean =
    spark.sql(s"SELECT video_header_meta(unhex('$hex')) AS m")
      .head().isNullAt(0)

  private val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
  private def mvhdV0(ts: Int, dur: Int): String =
    "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      f"$ts%08X" + f"$dur%08X" + "00" * 80

  test("minimal mp4: ftyp then moov/mvhd v0") {
    val hex = ftyp + "00000074" + "6D6F6F76" + mvhdV0(1000, 4242)
    decode(hex) shouldBe Row("mp4", "isom", 1000, 4242L)
  }

  test("a fixed-offset parser would fail: free box shifts moov") {
    def mp4(pad: Int): String =
      ftyp + f"${8 + pad}%08X" + "66726565" + "00" * pad +
        "00000074" + "6D6F6F76" + mvhdV0(90000, 180000)
    decode(mp4(3)) shouldBe Row("mp4", "isom", 90000, 180000L)
    decode(mp4(21)) shouldBe Row("mp4", "isom", 90000, 180000L)
  }

  test("mvhd version 1 carries 64-bit timestamps and duration") {
    // v1 payload: ver/flags(4) ctime(8) mtime(8) timescale(4) dur(8)
    val mvhd1 = "00000078" + "6D766864" + "01000000" +
      "0000000000000000" + "0000000000000000" +
      "00002710" + "00000001" + "00000000" + // ts 10000, dur 2^32
      "00" * 80
    val hex = ftyp + "00000080" + "6D6F6F76" + mvhd1
    decode(hex) shouldBe Row("mp4", "isom", 10000, 4294967296L)
  }

  test("size==1 largesize escape and size==0 to-EOF are honored") {
    // the free box declares size 1 and carries its true size in the
    // 64-bit largesize field; moov declares size 0 (extends to EOF)
    val free1 = "00000001" + "66726565" + "0000000000000014" + "00" * 4
    val hex = ftyp + free1 + "00000000" + "6D6F6F76" + mvhdV0(600, 1200)
    decode(hex) shouldBe Row("mp4", "isom", 600, 1200L)
  }

  test("rejects: no ftyp before moov, missing mvhd, corrupt size, truncation") {
    decodeNull("00000074" + "6D6F6F76" + mvhdV0(1000, 1)) shouldBe true
    // moov whose only child is not mvhd
    decodeNull(ftyp + "00000010" + "6D6F6F76" +
      "00000008" + "66726565") shouldBe true
    // box size below the 8-byte header
    decodeNull(ftyp + "00000004" + "6D6F6F76") shouldBe true
    // mvhd truncated before the duration field
    decodeNull(ftyp + "00000020" + "6D6F6F76" +
      "0000006C" + "6D766864" + "00000000" + "00000000") shouldBe true
    decodeNull("00112233") shouldBe true
  }
}
