package graft

import graft.functions.{Erf, KeyedTopNBuffer, Porter2, PrestoDatetime, SpookyHashV2, TopNBuffer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized-property checks (seeded, deterministic) over the
  * pure-Scala cores of graft's custom expressions. The reference has
  * no property tests (SURVEY §5.9); these are cheap insurance for
  * heap/merge/format edge cases.
  */
class PropertySpec extends AnyFunSuite with Matchers {
  private val rng = new scala.util.Random(42)

  test("TopNBuffer(largest/smallest) equals sorted take(n) on random input") {
    for (_ <- 1 to 300) {
      val xs = List.fill(rng.nextInt(60))(rng.nextDouble() * 2e9 - 1e9)
      val n = rng.nextInt(20) + 1
      val maxBuf = new TopNBuffer(n, wantLargest = true)
      val minBuf = new TopNBuffer(n, wantLargest = false)
      xs.foreach { v => maxBuf.add(v); minBuf.add(v) }
      maxBuf.values.toSeq shouldBe xs.sorted(Ordering[Double].reverse).take(n)
      minBuf.values.toSeq shouldBe xs.sorted.take(n)
    }
  }

  test("TopNBuffer merge equals one combined buffer") {
    for (_ <- 1 to 300) {
      val a = List.fill(rng.nextInt(40))(rng.nextDouble() * 2e6 - 1e6)
      val b = List.fill(rng.nextInt(40))(rng.nextDouble() * 2e6 - 1e6)
      val one = new TopNBuffer(5, wantLargest = true)
      (a ++ b).foreach(one.add)
      val left = new TopNBuffer(5, wantLargest = true)
      a.foreach(left.add)
      val right = new TopNBuffer(5, wantLargest = true)
      b.foreach(right.add)
      right.values.foreach(left.add)
      left.values.toSeq shouldBe one.values.toSeq
    }
  }

  test("KeyedTopNBuffer equals key-sorted take(n) with value tie-break") {
    for (_ <- 1 to 300) {
      val xs = List.fill(rng.nextInt(60))(
        (rng.nextInt(10).toDouble, rng.nextInt(1000).toLong)) // key ties likely
      val n = rng.nextInt(10) + 1
      val maxBuf = new KeyedTopNBuffer(n, wantLargest = true)
      val minBuf = new KeyedTopNBuffer(n, wantLargest = false)
      xs.foreach { case (k, v) => maxBuf.add(k, v); minBuf.add(k, v) }
      val refMax = xs.sortBy { case (k, v) => (-k, v) }.take(n).map(_._2)
      val refMin = xs.sortBy { case (k, v) => (k, v) }.take(n).map(_._2)
      maxBuf.values.toSeq shouldBe refMax
      minBuf.values.toSeq shouldBe refMin
    }
  }

  test("KeyedTopNBuffer merge equals one combined buffer") {
    for (_ <- 1 to 300) {
      val a = List.fill(rng.nextInt(40))((rng.nextInt(8).toDouble, rng.nextInt(100).toLong))
      val b = List.fill(rng.nextInt(40))((rng.nextInt(8).toDouble, rng.nextInt(100).toLong))
      val one = new KeyedTopNBuffer(4, wantLargest = true)
      (a ++ b).foreach { case (k, v) => one.add(k, v) }
      val left = new KeyedTopNBuffer(4, wantLargest = true)
      a.foreach { case (k, v) => left.add(k, v) }
      val right = new KeyedTopNBuffer(4, wantLargest = true)
      b.foreach { case (k, v) => right.add(k, v) }
      left.mergeFrom(right)
      left.values.toSeq shouldBe one.values.toSeq
    }
  }

  test("Porter2 matches the reference word_stem vectors") {
    // TestWordStemFunction.java:26-35
    val vectors = Seq(
      "" -> "", "x" -> "x", "abc" -> "abc",
      "generally" -> "general", "useful" -> "use", "runs" -> "run",
      "run" -> "run", "authorized" -> "author",
      "accessories" -> "accessori", "intensifying" -> "intensifi")
    vectors.foreach { case (w, e) => withClue(w)(Porter2.stem(w) shouldBe e) }
  }

  test("Porter2 handles exceptional forms and step interactions") {
    val vectors = Seq(
      // exception lists
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "early" -> "earli", "only" -> "onli", "news" -> "news", "sky" -> "sky",
      "bias" -> "bias", "proceed" -> "proceed", "exceed" -> "exceed",
      "inning" -> "inning",
      // 1a/1b/1c shapes
      "hopping" -> "hop", "hoping" -> "hope", "knitting" -> "knit",
      "ties" -> "tie", "cries" -> "cri", "gaps" -> "gap", "gas" -> "gas",
      "kiwis" -> "kiwi", "cry" -> "cri", "say" -> "say", "by" -> "by",
      "feed" -> "feed",
      // step 2/3/4 chains (snowball sample vocabulary)
      "luxuriated" -> "luxuri", "conditional" -> "condit",
      "rational" -> "ration", "decisiveness" -> "decis")
    vectors.foreach { case (w, e) => withClue(w)(Porter2.stem(w) shouldBe e) }
  }

  test("SpookyHashV2 matches the reference vectors and is length-sensitive") {
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    // TestVarbinaryFunctions.java:338-341
    hex(SpookyHashV2.hash32Bytes(Array.emptyByteArray)) shouldBe "6BF50919"
    hex(SpookyHashV2.hash64Bytes(Array.emptyByteArray)) shouldBe "232706FC6BF50919"
    hex(SpookyHashV2.hash32Bytes("hello".getBytes("UTF-8"))) shouldBe "D382E6CA"
    hex(SpookyHashV2.hash64Bytes("hello".getBytes("UTF-8"))) shouldBe "3768826AD382E6CA"
    // every length 0..300 (crosses the 16/32-byte short chunks and the
    // 192-byte short→long boundary) yields a distinct, stable hash
    val hashes = (0 to 300).map { n =>
      val data = Array.tabulate[Byte](n)(i => (i * 131 + 7).toByte)
      val h = SpookyHashV2.hash64(data, 0L)
      SpookyHashV2.hash64(data, 0L) shouldBe h // deterministic
      h
    }
    hashes.distinct.size shouldBe hashes.size
  }

  test("erf is odd, bounded in [-1,1], and monotone") {
    val pts = List.fill(500)(rng.nextDouble() * 12 - 6).sorted
    pts.foreach { x =>
      Erf.compute(x) should (be >= -1.0 and be <= 1.0)
      (Erf.compute(-x) + Erf.compute(x)) shouldBe 0.0 +- 1e-6
    }
    pts.sliding(2).foreach {
      case List(x, y) => Erf.compute(x) should be <= Erf.compute(y) + 1e-9
      case _ =>
    }
  }

  test("probit/cdf roundtrip over the open unit interval") {
    for (_ <- 1 to 500) {
      val p = rng.nextDouble() * 0.998 + 0.001
      val x = Erf.probit(p)
      0.5 * (1.0 + Erf.compute(x / math.sqrt(2.0))) shouldBe p +- 2e-4
    }
  }

  test("translateFormat is total over random %-pattern strings") {
    val atoms = Seq("%Y", "%y", "%m", "%c", "%d", "%e", "%H", "%k", "%h", "%i",
      "%s", "%f", "%p", "%M", "%b", "%W", "%a", "%j", "%T", "%%",
      "-", "/", ":", " ", ".", "abc", "T", "%", "%q")
    for (_ <- 1 to 500) {
      val fmt = List.fill(rng.nextInt(12))(atoms(rng.nextInt(atoms.length))).mkString
      noException should be thrownBy PrestoDatetime.translateFormat(fmt)
    }
  }
}
