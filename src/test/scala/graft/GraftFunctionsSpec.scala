package graft

import graft.functions.{Erf, GraftExtensions, GraftFunctions, Hmac}
import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftFunctionsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("all custom functions resolve through the session registry") {
    GraftFunctions.all.map(_._1).foreach { name =>
      withClue(name) {
        spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)) shouldBe true
      }
    }
  }

  test("GraftExtensions injects the same function set") {
    // the extensions path is what external sessions use via
    // spark.sql.extensions=graft.functions.GraftExtensions
    noException should be thrownBy new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("erf matches known values") {
    Erf.compute(0.0) shouldBe 0.0 +- 1e-7
    Erf.compute(1.0) shouldBe 0.8427008 +- 1e-6
    Erf.compute(-1.0) shouldBe -0.8427008 +- 1e-6
    Erf.compute(2.0) shouldBe 0.9953223 +- 1e-6
  }

  test("probit inverts the normal cdf") {
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val x = Erf.probit(p)
      val backP = 0.5 * (1.0 + Erf.compute(x / math.sqrt(2.0)))
      backP shouldBe p +- 1e-4
    }
  }

  test("probit is NaN outside (0,1)") {
    Erf.probit(0.0).isNaN shouldBe true
    Erf.probit(1.0).isNaN shouldBe true
  }

  test("hmac-sha256 matches RFC 4231 test case 1") {
    // key = 0x0b*20 is binary; use the string-key case 2 instead
    Hmac.compute("HmacSHA256", "what do ya want for nothing?", "Jefe") shouldBe
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
  }

  test("erf/probit work through SQL with codegen") {
    import spark.implicits._
    val r = spark.sql("SELECT round(erf(1.0), 6) AS e, round(probit(0.5), 6) AS p")
      .as[(Double, Double)].head()
    r._1 shouldBe 0.842701 +- 1e-5
    r._2 shouldBe 0.0 +- 1e-9
  }
}
