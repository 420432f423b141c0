package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-20 optimizations. */
class Round20FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("xx_minhash_sigs is bit-identical to the 64 array_min(transform(xxhash64)) folds") {
    // The codegen expression replaces dedup_minhash_lsh's banding HOFs
    // (optimization r20; VERDICT r19 next #1). Identity must hold for
    // arbitrary long arrays, including empty and single-element ones
    // — compare against the exact expression shape the banding used.
    import spark.implicits._
    val rnd = new scala.util.Random(20L)
    val rows = Seq.fill(200)(Seq.fill(rnd.nextInt(40))(rnd.nextLong())) ++
      Seq(Seq.empty[Long], Seq(0L), Seq(Long.MinValue, Long.MaxValue, 42L))
    val df = rows.toDF("w")
    val hof = array((0 until 64).map(k =>
      array_min(transform($"w", t => xxhash64(t, lit(k))))): _*)
    val both = df.select(
      call_function("xx_minhash_sigs", $"w").as("fast"), hof.as("ref"))
    both.filter(!($"fast" <=> $"ref")).count() shouldBe 0L
    // and the null input maps to null, as transform(null) would
    val nulls = Seq(Tuple1[Seq[Long]](null)).toDF("w")
      .select(call_function("xx_minhash_sigs", $"w").as("m"))
    nulls.filter($"m".isNull).count() shouldBe 1L
  }
}
