package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-18 fixes. */
class Round18FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** Independent plain-Scala reference for the unigram Viterbi argmax
    * under the shipped order (total DESC, np ASC, seg ASC): a direct
    * per-prefix DP over an explicit piece→units map, sharing no code
    * with the engine path. */
  private def refBestSeg(w: String, units: Map[String, Long])
      : Option[(String, Int, Long)] = {
    val maxPl = if (units.isEmpty) 0 else units.keys.map(_.length).max
    // dp(j) = best (total, np, seg) for w[0..j)
    val dp = new Array[Option[(Long, Int, String)]](w.length + 1)
    dp(0) = Some((0L, 0, ""))
    for (j <- 1 to w.length) {
      var best: Option[(Long, Int, String)] = None
      for (i <- math.max(0, j - maxPl) until j) {
        (dp(i), units.get(w.substring(i, j))) match {
          case (Some((t, np, seg)), Some(u)) =>
            val cand = (t + u, np + 1,
              if (i == 0) w.substring(i, j) else seg + " " + w.substring(i, j))
            val better = best match {
              case None => true
              case Some((bt, bnp, bseg)) =>
                cand._1 > bt ||
                  (cand._1 == bt && (cand._2 < bnp ||
                    (cand._2 == bnp && cand._3 < bseg)))
            }
            if (better) best = Some(cand)
          case _ =>
        }
      }
      dp(j) = best
    }
    dp(w.length).map { case (t, np, seg) => (seg, np, t) }
  }

  test("unigram lattice DP == cut-mask enumeration on the shipped corpus") {
    // VERDICT r17 wrong #1 / next #1: the engine now runs the exact
    // O(L·maxPieceLen) lattice DP; the r17 2^(L-1) enumeration
    // survives only as the reference this pin compares against —
    // on the real corpus words under the SHIPPED seed units and the
    // round-1 re-counted units (both engine frames, zero drift).
    import spark.implicits._
    val tp = queries.TextPipeline
    // the r19 planted 40-char token is exactly what the enumeration
    // CANNOT attempt (2^39 masks) — this pin compares DP vs
    // enumeration on the enumerable words only; the long-token case
    // has its own independent-reference pin below. Units still derive
    // from the FULL word table (plant included), matching the gate.
    val allWords = tp.unigramWords(spark, sfDir).localCheckpoint()
    val words = allWords
      .filter(org.apache.spark.sql.functions.length($"w") <= 16)
      .localCheckpoint()
    val seedUnits = tp.unigramUnits(tp.unigramSeedCounts(allWords))
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"w", $"freq", $"seg", $"np").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .toSet
    val dp1 = collectSet(tp.unigramBestSeg(words, seedUnits))
    val en1 = collectSet(tp.unigramBestSegEnum(words, seedUnits))
    dp1 should not be empty
    dp1 shouldBe en1
    // one EM re-count round deep, too: the argmax must agree on the
    // pruned vocabulary, not just the seed one
    val cnts1 = tp.unigramBestSeg(words, seedUnits)
      .select($"freq", explode(split($"seg", " ")).as("piece"))
      .groupBy($"piece").agg(sum($"freq").as("cnt"))
    val units1 = tp.unigramUnits(cnts1).localCheckpoint()
    collectSet(tp.unigramBestSeg(words, units1)) shouldBe
      collectSet(tp.unigramBestSegEnum(words, units1))
  }

  test("unigram lattice DP segments a 40-char word the enumeration never could") {
    // The r17 enumeration needed 2^39 cut masks for this word; the DP
    // needs 40·4 lattice edges. Checked against an independent
    // plain-Scala DP over the same explicit unit map — including a
    // tie the (np, seg) order must break, a mid-word unreachable
    // position ('q' has no unit and no covering piece crosses it
    // cheaply... it is covered only by single-char fallback), and a
    // word with NO valid segmentation (dropped, not erred).
    import spark.implicits._
    val tp = queries.TextPipeline
    val longW = "antidisestablishmentarianismhood" + "12345678" // 40 chars
    longW.length shouldBe 40
    val unitMap: Map[String, Long] =
      (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -40L).toMap ++
        Map("anti" -> -9L, "dis" -> -8L, "est" -> -7L, "ab" -> -5L,
          "lish" -> -9L, "ment" -> -9L, "arian" -> -11L, "ism" -> -8L,
          "hood" -> -9L, "1234" -> -6L, "5678" -> -6L, "ta" -> -5L,
          "bl" -> -5L, "is" -> -5L, "hm" -> -5L, "en" -> -5L)
    val words = Seq((longW, 3L), ("noXmatch", 1L), ("abab", 2L))
      .toDF("w", "freq")
      .filter($"w" =!= "noXmatch" || lit(true)) // keep all three
    val units = unitMap.toSeq.toDF("piece", "units")
    val got = tp.unigramBestSeg(words, units)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(3)))
      .sortBy(_._1)
    val want = Seq(longW, "noXmatch", "abab").flatMap { w =>
      refBestSeg(w, unitMap).map { case (seg, np, _) => (w, seg, np) }
    }.sortBy(_._1)
    // "noXmatch" contains 'X' — no unit covers it (units are
    // lowercase/digits), so the word must be DROPPED by both
    want.map(_._1) should not contain "noXmatch"
    got should contain theSameElementsInOrderAs want
    // and the round-trip contract holds on the long word
    val (_, seg, _) = got.find(_._1 == longW).get
    seg.replace(" ", "") shouldBe longW
  }

  test("standing near-dup bucket index is build-once") {
    // ensureNeardupBuckets writes only when the warehouse asset is
    // absent — a second call must not rewrite a single file, or the
    // "one signature pass per corpus EVER" claim is false and every
    // consumer pays the 64-minhash build per run
    val tp = queries.TextPipeline
    val path = tp.ensureNeardupBuckets(spark, sfDir)
    val dir = new java.io.File(path.stripPrefix("file:"))
    dir.exists() shouldBe true
    val stamps = dir.listFiles().map(f => (f.getName, f.lastModified())).toSet
    Thread.sleep(1100) // mtime granularity
    tp.ensureNeardupBuckets(spark, sfDir) shouldBe path
    dir.listFiles().map(f => (f.getName, f.lastModified())).toSet shouldBe stamps
  }
}
