package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Float-margin audit for sim_ann_pq (the ccnet keep-threshold
  * precedent): every cross-engine fp DECISION in the PQ pipeline —
  * subvector→codeword assignment and the final ADC ranking — must sit
  * either at an exact tie (identical left-to-right folds are
  * bit-equal in both engines, and the cid/vec_id tie-break then
  * decides identically) or at a margin that dwarfs the ~1e-14
  * noise the avg'd centroids can carry. Threshold 1e-9 ≈ 10^5×
  * headroom.
  */
class PqMarginSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val M = 4; private val Sub = 16; private val K = 8

  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Rebuilds the gate query's intermediate tables (same ops). */
  private def tables(dir: String): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val sub = corpus.select($"vec_id",
      posexplode(expr(
        s"transform(sequence(0, ${M - 1}), m -> slice(v, m * $Sub + 1, $Sub))"))
        .as(Seq("m", "sv")))
    val wAssign = Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")
    val seeds = sub.filter($"vec_id" < K)
      .select($"m", $"vec_id".cast("int").as("cid"), $"sv".as("cw"))
    val seedD2 = sub.join(broadcast(seeds), Seq("m"))
      .withColumn("d2", d2($"sv", $"cw"))
    val assign1 = seedD2
      .withColumn("rn", row_number().over(wAssign)).filter($"rn" === 1)
    val codebook = assign1
      .select($"m", $"cid", posexplode($"sv").as(Seq("i", "x")))
      .groupBy($"m", $"cid", $"i").agg(avg($"x").as("c"))
      .groupBy($"m", $"cid")
      .agg(transform(array_sort(collect_list(struct($"i", $"c"))),
        e => e.getField("c")).as("cw"))
    val codeD2 = sub.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", d2($"sv", $"cw"))
    val codes = codeD2
      .withColumn("rn", row_number().over(wAssign)).filter($"rn" === 1)
      .select($"vec_id", $"m", $"cid")
    val qsub = sub.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"m", $"sv".as("qsv"))
    val adcTab = qsub.join(broadcast(codebook), Seq("m"))
      .select($"q_id", $"m", $"cid", d2($"qsv", $"cw").as("pd2"))
    val adc = codes.join(broadcast(adcTab), Seq("m", "cid"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum(when($"m" === 0, $"pd2")).as("p0"),
        sum(when($"m" === 1, $"pd2")).as("p1"),
        sum(when($"m" === 2, $"pd2")).as("p2"),
        sum(when($"m" === 3, $"pd2")).as("p3"))
      .withColumn("adc", ($"p0" + $"p1") + $"p2" + $"p3")
    (seedD2, codeD2, adc)
  }

  /** Smallest POSITIVE gap between the winner and runner-up of every
    * argmin group (exact ties are excluded — they resolve by the
    * deterministic id tie-break on bit-equal values). */
  private def minArgminGap(df: DataFrame, part: Seq[String]): Double = {
    import spark.implicits._
    val w = Window.partitionBy(part.map(col): _*).orderBy($"d2")
    df.withColumn("gap", $"d2" - lag($"d2", 1).over(w))
      .filter($"gap" > 0)
      .agg(min($"gap")).as[Double].head()
  }

  test("assignment and ranking margins exceed 1e-9 (or are exact ties)") {
    import spark.implicits._
    val bigDir =
      new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.01")
    val dirs = sfDir +: (if (bigDir.isDirectory) Seq(bigDir.toString) else Nil)
    for (dir <- dirs) {
      val (seedD2, codeD2, adc) = tables(dir)
      val g1 = minArgminGap(seedD2, Seq("vec_id", "m"))
      val g2 = minArgminGap(codeD2, Seq("vec_id", "m"))
      val w = Window.partitionBy($"q_id").orderBy($"adc")
      val g3 = adc.withColumn("gap", $"adc" - lag($"adc", 1).over(w))
        .withColumn("rn", row_number().over(w))
        .filter($"gap" > 0 && $"rn" <= 5) // decisions near the top-3 cut
        .agg(min($"gap")).as[Double].head()
      info(f"$dir: seed-assign gap $g1%.3e, code-assign gap $g2%.3e, " +
        f"adc gap $g3%.3e")
      g1 should be > 1e-9
      g2 should be > 1e-9
      g3 should be > 1e-9
    }
  }
}
