package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the stem-dict export (r14's accumulating union,
  * restructured in r15 to Verify-side per-corpus materialization —
  * VERDICT r14 wrong #1 / ADVICE r14 #2). The property under pin is
  * unchanged from r14: a run at one scale factor must never invalidate
  * another corpus's oracle dict (the live-caught 'rep'-token clobber,
  * where a sf0.001 run between the sf1 Verify and its oracle compare
  * dropped an sf1-only token).
  */
class Round14FixesSpec extends AnyFunSuite with SparkFixture with Matchers {
  import graft.queries.TextPipeline

  private def corpusTokens(dir: String): Set[String] = {
    import org.apache.spark.sql.{functions => F}
    Tables.documents(spark, dir)
      .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).as("tok"))
      .filter(F.length(F.col("tok")) >= 3)
      .distinct().collect().map(_.getString(0)).toSet
  }

  /** All (tok, stem) rows the oracle's glob would see, deduplicated the
    * way its `SELECT DISTINCT` does. */
  private def globbedDict(): Seq[(String, String)] = {
    val dirs = Option(new java.io.File(TextPipeline.stemDictBase)
        .listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("dict_"))
      .map(_.toString)
    spark.read.parquet(dirs.toIndexedSeq: _*)
      .select("tok", "stem").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toIndexedSeq
  }

  // the larger sibling corpus, derived from the fixture's data root
  // rather than hardcoded (ADVICE r14 #3) — skip cleanly when absent
  private val bigDir =
    new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.01")

  test("per-corpus dicts survive interleaved scale factors (r14 clobber)") {
    assume(bigDir.isDirectory, s"sibling corpus $bigDir not present")
    val big = bigDir.toString
    TextPipeline.materializeStemDict(spark, big)
    val bigToks = corpusTokens(big)
    globbedDict().map(_._1).toSet should contain allElementsOf bigToks

    // an interleaved export at the small corpus must PRESERVE them
    TextPipeline.materializeStemDict(spark, sfDir)
    val toks = globbedDict().map(_._1).toSet
    toks should contain allElementsOf bigToks
    toks should contain allElementsOf corpusTokens(sfDir)
  }

  test("glob-distinct dict stays unique per token across corpora") {
    TextPipeline.materializeStemDict(spark, sfDir)
    if (bigDir.isDirectory)
      TextPipeline.materializeStemDict(spark, bigDir.toString)
    // the stemmer is a pure function of the token, so the oracle's
    // DISTINCT (tok, stem) must collapse cross-corpus overlap to one
    // row per token — a duplicate here would fan out the oracle join
    val d = globbedDict()
    d.size shouldBe d.map(_._1).distinct.size
  }

  test("export is idempotent and never runs inside the gated query") {
    TextPipeline.materializeStemDict(spark, sfDir)
    val target = new java.io.File(TextPipeline.stemDictBase,
      "dict_" + sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    val before = new java.io.File(target, "_SUCCESS").lastModified()
    // a completed export is reused, not rewritten
    TextPipeline.materializeStemDict(spark, sfDir)
    new java.io.File(target, "_SUCCESS").lastModified() shouldBe before
    // the gate query itself must not write: running it leaves every
    // dict dir untouched (VERDICT r14 wrong #1)
    SparkEntry.queries("text_stem_terms")(spark, sfDir).count()
    new java.io.File(target, "_SUCCESS").lastModified() shouldBe before
  }
}
