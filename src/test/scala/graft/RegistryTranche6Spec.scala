package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-4 registry-diff closure: names found unregistered by diffing
  * DumpFunctions output against every function name extracted from the
  * reference's annotations (BitwiseFunctions, WilsonInterval,
  * GeoFunctions great_circle_distance, MathFunctions cosine_similarity,
  * VarbinaryFunctions sha256/sha512, UrlFunctions url_extract_port,
  * HyperLogLogFunctions empty_approx_set, ApplyFunction).
  */
class RegistryTranche6Spec extends AnyFunSuite with SparkFixture with Matchers {

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head().get(0)

  test("named bitwise scalars match 2's-complement semantics") {
    one("bitwise_and(19L, 25L)") shouldBe 17L
    one("bitwise_or(19L, 25L)") shouldBe 27L
    one("bitwise_xor(19L, 25L)") shouldBe 10L
    one("bitwise_not(-12L)") shouldBe 11L
    one("bitwise_not(0L)") shouldBe -1L
  }

  test("wilson interval bounds match the reference formula") {
    // 1250/1310 successes, z=1.96 — a case from Presto's docs family
    val lo = one("wilson_interval_lower(1250L, 1310L, 1.96)").asInstanceOf[Double]
    val hi = one("wilson_interval_upper(1250L, 1310L, 1.96)").asInstanceOf[Double]
    lo shouldBe 0.9414883725395894 +- 1e-12
    hi shouldBe 0.9642524717143908 +- 1e-12
    lo should be < (1250.0 / 1310)
    hi should be > (1250.0 / 1310)
    // degenerate: zero successes lower bound is 0
    one("wilson_interval_lower(0L, 10L, 1.96)").asInstanceOf[Double] shouldBe 0.0 +- 1e-12
  }

  test("great_circle_distance matches known city-pair distance and guards ranges") {
    // Presto's own test vector: (36.12,-86.67) -> (33.94,-118.40) ≈ 2886.45 km
    one("great_circle_distance(36.12, -86.67, 33.94, -118.40)")
      .asInstanceOf[Double] shouldBe 2886.45 +- 0.01
    one("great_circle_distance(10.0, 20.0, 10.0, 20.0)")
      .asInstanceOf[Double] shouldBe 0.0 +- 1e-9
    val e = intercept[Exception](one("great_circle_distance(91.0, 0.0, 0.0, 0.0)"))
    e.getMessage should include("Latitude")
  }

  test("sparse-map cosine_similarity matches hand-computed values") {
    // identical maps → 1; orthogonal keys → 0
    one("cosine_similarity(map('a', 1.0D, 'b', 2.0D), map('a', 1.0D, 'b', 2.0D))")
      .asInstanceOf[Double] shouldBe 1.0 +- 1e-9
    one("cosine_similarity(map('a', 1.0D), map('b', 1.0D))")
      .asInstanceOf[Double] shouldBe 0.0 +- 1e-12
    // dot = 1*3 over norms sqrt(5)*sqrt(13)
    one("cosine_similarity(map('a', 1.0D, 'b', 2.0D), map('a', 3.0D, 'c', 2.0D))")
      .asInstanceOf[Double] shouldBe (3.0 / (math.sqrt(5) * math.sqrt(13))) +- 1e-12
  }

  test("sha256/sha512 return the digest bytes, not hex text") {
    one("lower(hex(sha256(cast('abc' AS BINARY))))") shouldBe
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    one("length(sha256(cast('' AS BINARY)))") shouldBe 32
    one("length(sha512(cast('' AS BINARY)))") shouldBe 64
  }

  test("url_extract_port: present, absent, and authority-with-userinfo") {
    one("url_extract_port('http://h.com:8080/x')") shouldBe 8080L
    assert(one("url_extract_port('http://h.com/x')") == null)
    one("url_extract_port('http://u:p@h.com:9443/x')") shouldBe 9443L
  }

  test("empty_approx_set estimates zero and unions as identity") {
    one("hll_sketch_estimate(empty_approx_set())") shouldBe 0L
    one("""hll_sketch_estimate(hll_union(empty_approx_set(),
          |  (SELECT hll_sketch_agg(x) FROM VALUES (1), (2), (3) t(x))))""".stripMargin)
      .shouldBe(3L)
  }

  test("apply evaluates unary lambdas, including over nulls and nesting") {
    one("apply(5, x -> x * 2 + 1)") shouldBe 11
    one("apply('ab', s -> upper(s))") shouldBe "AB"
    // null flows INTO the lambda (Presto semantics)
    one("apply(cast(NULL AS INT), x -> coalesce(x, 42))") shouldBe 42
    // lambda body may itself use higher-order functions
    one("apply(array(1, 2, 3), a -> aggregate(a, 0, (acc, v) -> acc + v))") shouldBe 6
    // apply inside transform: outer lambda var feeds the inner apply input
    one("transform(array(1, 2), v -> apply(v, x -> x + 10))") shouldBe Seq(11, 12)
  }
}
