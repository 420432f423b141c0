package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden vectors + reject paths for wav_sample_stats (the
  * PngPixelSpec discipline): real WAVs built by an independent
  * encoder in this spec — canonical 44-byte layout AND a chunk-walk
  * variant with LIST before fmt — decoded by the expression and
  * checked against sums computed directly from the sample arrays. */
class WavSampleSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** Independent encoder: 16-bit PCM, optional pre-fmt LIST chunk. */
  private def encodeWav(ch: Int, rate: Int, samples: Array[Short],
      listBytes: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    val listLen = if (listBytes > 0) 8 + listBytes + listBytes % 2 else 0
    tag("RIFF"); le32(4 + listLen + 24 + 8 + samples.length * 2); tag("WAVE")
    if (listBytes > 0) {
      tag("LIST"); le32(listBytes)
      out.write(Array.fill(listBytes + listBytes % 2)('x'.toByte))
    }
    tag("fmt "); le32(16)
    le16(1); le16(ch); le32(rate); le32(rate * ch * 2); le16(ch * 2); le16(16)
    tag("data"); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  private def decode(bytes: Array[Byte]) = {
    import spark.implicits._
    Seq(bytes).toDF("payload")
      .select(expr("wav_sample_stats(payload)").as("st"))
      .select($"st.channels", $"st.sample_rate", $"st.n_frames",
        $"st.sum_abs", $"st.sum_sq", $"st.peak")
      .collect()(0)
  }

  private def expected(samples: Array[Short]): (Long, Long, Int) =
    (samples.map(s => math.abs(s.toLong)).sum,
      samples.map(s => s.toLong * s).sum,
      samples.map(s => math.abs(s.toInt)).max)

  test("canonical mono WAV decodes to exact amplitude sums") {
    val samples = Array.tabulate(97)(i =>
      ((i * i * 911 + 13) % 65536 - 32768).toShort)
    val row = decode(encodeWav(1, 16000, samples))
    val (sa, sq, pk) = expected(samples)
    (row.getInt(0), row.getInt(1), row.getLong(2)) shouldBe ((1, 16000, 97L))
    (row.getLong(3), row.getLong(4), row.getInt(5)) shouldBe ((sa, sq, pk))
  }

  test("stereo WAV with an odd-size LIST chunk before fmt decodes exactly") {
    // frames = samples/2; the LIST pad byte moves fmt AND data —
    // a fixed-offset reader decodes garbage and fails the sums
    val samples = Array.tabulate(120)(i => ((i * 7919) % 65536 - 32768).toShort)
    val row = decode(encodeWav(2, 44100, samples, listBytes = 13))
    val (sa, sq, pk) = expected(samples)
    (row.getInt(0), row.getLong(2)) shouldBe ((2, 60L))
    (row.getLong(3), row.getLong(4), row.getInt(5)) shouldBe ((sa, sq, pk))
  }

  /** Independent encoder for 8-bit unsigned PCM (r19): samples are
    * raw unsigned bytes 0..255 (biased at 128, RIFF convention). */
  private def encodeWav8(ch: Int, rate: Int,
      samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    tag("RIFF"); le32(4 + 24 + 8 + samples.length); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(ch); le32(rate); le32(rate * ch); le16(ch); le16(8)
    tag("data"); le32(samples.length)
    samples.foreach(out.write)
    out.toByteArray
  }

  test("8-bit unsigned PCM decodes with the 128 bias removed") {
    val samples = Array.tabulate(131)(i => (i * 53 + 7) % 256) // 0..255
    val row = decode(encodeWav8(1, 11025, samples))
    val centered = samples.map(_ - 128)
    (row.getInt(0), row.getInt(1), row.getLong(2)) shouldBe ((1, 11025, 131L))
    row.getLong(3) shouldBe centered.map(s => math.abs(s).toLong).sum
    row.getLong(4) shouldBe centered.map(s => s.toLong * s).sum
    row.getInt(5) shouldBe centered.map(math.abs).max
    // extremes: 0 -> -128 (abs 128), 255 -> 127
    val ext = decode(encodeWav8(1, 8000, Array(0, 255, 128)))
    ext.getLong(3) shouldBe 128L + 127L + 0L
    ext.getInt(5) shouldBe 128
  }

  test("extreme values: Short.MinValue abs and peak stay exact") {
    val samples = Array[Short](Short.MinValue, Short.MaxValue, 0, -1)
    val row = decode(encodeWav(1, 8000, samples))
    row.getLong(3) shouldBe 32768L + 32767L + 0L + 1L
    row.getLong(4) shouldBe 32768L * 32768 + 32767L * 32767 + 1L
    row.getInt(5) shouldBe 32768
  }

  test("reject paths return NULL, never throw") {
    import spark.implicits._
    val good = encodeWav(1, 8000, Array.tabulate(10)(i => (i * 1000).toShort))
    val truncated = good.take(good.length - 6) // data chunk overruns
    val floatFmt = { val b = good.clone(); b(20) = 3; b } // format tag 3
    val eightBit = { // bits flipped to 8 while block align stays ch*2:
      // 8-bit is SUPPORTED now (r19), but the inconsistent block
      // align must still reject the mislabel
      val b = good.clone(); b(34) = 8; b
    }
    val raggedData = { // declared data size not a whole frame count
      val b = encodeWav(2, 8000, Array.tabulate(9)(_.toShort)); b
    }
    val notWav = "RIFFxxxxJUNK".getBytes("US-ASCII")
    val rows = Seq(truncated, floatFmt, eightBit, raggedData, notWav)
      .toDF("payload")
      .select(expr("wav_sample_stats(payload)").as("st")).collect()
    all(rows.map(_.isNullAt(0))) shouldBe true
  }
}
