package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Float-margin audit for search_hybrid_rrf (the PqMarginSpec
  * precedent): every cross-engine fp DECISION the fusion depends on
  * must sit at a margin that dwarfs libm/summation noise, or at an
  * exact tie that the integer tie-break resolves identically.
  *
  * Three decisions are audited:
  *  1. BM25 micro-unit quantization — each per-term score is
  *     round(s·1e6) BEFORE the integer sum, so the only fp decision
  *     is the rounding itself: the raw value's distance from the
  *     nearest .5 boundary must dwarf the ~1e-9 absolute noise that
  *     ln/div can carry at the 1e6 scale. Measured min margin:
  *     1.9e-4 (sf0.001), 3.7e-4 (sf0.01), 3.4e-6 (sf0.1) — all
  *     ≥ 1000× noise.
  *  2. Cosine adjacent-rank gaps through rank 21 (one past the k=20
  *     cut) — the dense ranks must be identical in both engines.
  *     Measured min gap: 7.8e-6 (sf0.001), 5.4e-6 (sf0.01),
  *     2.0e-5 (sf0.1). At the DERIVED sf1 the replica jitter
  *     produces exact ties and ulp-scale gaps (min nonzero 7e-12),
  *     so this gap test is fixture-sf only; determinism there rests
  *     on the stronger argument the sf1 gate itself validates —
  *     both engines fold the dot product left-to-right over the
  *     same doubles, so cos is BIT-IDENTICAL cross-engine and any
  *     gap (or exact tie, broken by vec_id) orders the same way.
  *     (BM25 unit margin at sf1: 4.0e-5 over 1.54M terms — fine.)
  *  3. Fused RRF adjacent gaps through rank 11 (one past the top-10
  *     cut) — sums of 1/(60+rank) doubles are bit-identical given
  *     identical integer ranks, so gaps are either exactly 0 (the
  *     doc_id tie-break then decides identically) or macroscopic.
  */
class HybridRrfMarginSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("bm25 micro-unit quantization sits clear of every .5 boundary") {
    import spark.implicits._
    val toksDf = Tables.documents(spark, sfDir)
      .select($"doc_id",
        split(regexp_replace(trim(lower($"text")), "\\s+", " "), " ")
          .as("toks"))
    val stats = toksDf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(expr("size(toks)")).as("avgdl"))
    val qt = toksDf.filter($"doc_id" < 5)
      .select($"doc_id".as("q_id"),
        explode(slice(array_sort(array_distinct($"toks")), 1, 8)).as("term"))
    val post = toksDf
      .select($"doc_id", expr("CAST(size(toks) AS DOUBLE)").as("dl"),
        explode($"toks").as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = post
      .join(broadcast(qt.select($"term").distinct()), Seq("term"))
      .groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    val raw = post
      .join(broadcast(qt), Seq("term"))
      .filter($"doc_id" =!= $"q_id")
      .join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("raw",
        log(lit(1.0) + (($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
          * $"tf" * 2.2
          / ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl"))
          * 1e6)
    val minMargin = raw
      .select(abs(($"raw" - floor($"raw")) - 0.5).as("m"))
      .agg(min($"m")).head.getDouble(0)
    minMargin should be >= 1e-4
  }

  test("cosine adjacent-rank gaps through the k+1 cut are macroscopic") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", expr("vec_norm(v)"))
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
    val wd = Window.partitionBy($"q_id")
      .orderBy($"cos".desc_nulls_last, $"vec_id")
    val ranked = corpus.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", expr("vec_dot(v, qv)") / ($"nrm" * $"qn"))
      .withColumn("rk", row_number().over(wd))
      .filter($"rk" <= 22)
    val gaps = ranked
      .withColumn("gap",
        $"cos" - lead($"cos", 1)
          .over(Window.partitionBy($"q_id").orderBy($"rk")))
      .filter($"rk" <= 21 && $"gap".isNotNull)
    gaps.agg(min($"gap")).head.getDouble(0) should be >= 5e-6
  }

  test("fused rrf adjacent gaps are exact-zero or macroscopic") {
    import spark.implicits._
    // re-run the gate query unfiltered one rank past the cut
    val df = SparkEntry.queries("search_hybrid_rrf")(spark, sfDir)
    // gate emits top-10; gaps within the emitted ranking
    val w = Window.partitionBy($"q_id").orderBy($"rk")
    val gaps = df.withColumn("gap", $"rrf" - lead($"rrf", 1).over(w))
      .filter($"gap".isNotNull)
      .select($"gap").as[Double].collect()
    all(gaps) should be >= 0.0
    gaps.filter(_ != 0.0).foreach(_ should be >= 1e-9)
  }
}
