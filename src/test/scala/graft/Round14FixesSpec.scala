package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-14 fixes. */
class Round14FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val dictPath =
    s"${sys.props("user.dir")}/spark-warehouse/graft_stem_dict"

  /** The stem-dict clobber caught live in r14: building text_stem_terms
    * at a SMALLER corpus between another corpus's Verify and its oracle
    * compare used to overwrite the dict and drop that corpus's tokens
    * (the sf1-only 'rep' token → a one-row gate miss). The accumulating
    * union must keep every previously-exported token across runs at
    * other scale factors.
    */
  test("stem dict accumulates across scale factors instead of clobbering") {
    def tokensAt(dir: String): Set[String] = {
      import org.apache.spark.sql.{functions => F}
      Tables.documents(spark, dir)
        .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).as("tok"))
        .filter(F.length(F.col("tok")) >= 3)
        .distinct().collect().map(_.getString(0)).toSet
    }
    def dictTokens(): Set[String] =
      spark.read.parquet(dictPath)
        .select("tok").collect().map(_.getString(0)).toSet

    val big = "/root/testdata/sf0.01"
    // run at the larger corpus first: its vocabulary lands in the dict
    SparkEntry.queries("text_stem_terms")(spark, big).count()
    val bigToks = tokensAt(big)
    dictTokens() should contain allElementsOf bigToks

    // an interleaved run at the small corpus must PRESERVE them
    SparkEntry.queries("text_stem_terms")(spark, sfDir).count()
    val after = dictTokens()
    after should contain allElementsOf bigToks
    after should contain allElementsOf tokensAt(sfDir)
  }

  test("dict entries stay unique per token after repeated runs") {
    SparkEntry.queries("text_stem_terms")(spark, sfDir).count()
    SparkEntry.queries("text_stem_terms")(spark, sfDir).count()
    val d = spark.read.parquet(dictPath)
    d.count() shouldBe d.select("tok").distinct().count()
  }
}
