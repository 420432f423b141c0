package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Presto-name compatibility shims resolve and compute correctly. */
class PrestoCatalogSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def one[T](sql: String): T =
    spark.sql(s"SELECT $sql AS v").collect().head.getAs[T]("v")

  test("string shims") {
    one[Int]("strpos('hello', 'll')") shouldBe 3
    one[Int]("codepoint('A')") shouldBe 65
  }

  test("datetime shims use ISO day-of-week") {
    // 2024-01-01 is a Monday
    one[Int]("day_of_week(TIMESTAMP '2024-01-01 00:00:00')") shouldBe 1
    one[Int]("dow(TIMESTAMP '2024-01-07 00:00:00')") shouldBe 7
    one[Int]("year_of_week(TIMESTAMP '2021-01-01 00:00:00')") shouldBe 2020
    one[Double]("to_unixtime(TIMESTAMP '1970-01-01 00:00:01')") shouldBe 1.0
  }

  test("math shims") {
    one[Double]("truncate(3.7)") shouldBe 3.0
    one[Double]("truncate(-3.7)") shouldBe -3.0
    one[Boolean]("is_nan(nan())") shouldBe true
    one[Boolean]("is_infinite(infinity())") shouldBe true
    one[Boolean]("is_finite(1.5)") shouldBe true
    one[Long]("from_base('ff', 16)") shouldBe 255L
    one[String]("to_base(255, 16)") shouldBe "ff"
    one[Long]("width_bucket_fn(5.0, 0.0, 10.0, 5)") shouldBe 3L
    one[Long]("width_bucket_fn(-1.0, 0.0, 10.0, 5)") shouldBe 0L
    one[Long]("width_bucket_fn(11.0, 0.0, 10.0, 5)") shouldBe 6L
  }

  test("normal_cdf / inverse_normal_cdf") {
    one[Double]("round(normal_cdf(0.0, 1.0, 0.0), 6)") shouldBe 0.5
    one[Double]("round(normal_cdf(0.0, 1.0, 1.96), 4)") shouldBe 0.975
    one[Double]("round(inverse_normal_cdf(0.0, 1.0, 0.975), 2)") shouldBe 1.96
    one[Double]("round(inverse_normal_cdf(10.0, 2.0, 0.5), 6)") shouldBe 10.0
  }

  test("json and url shims") {
    one[String]("json_extract_scalar('{\"a\": {\"b\": 3}}', '$.a.b')") shouldBe "3"
    one[String]("url_extract_host('https://h.example.com:8443/p?q=1#f')") shouldBe "h.example.com"
    one[String]("url_extract_parameter('https://h/p?q=1&r=2', 'r')") shouldBe "2"
  }

  test("binary shims") {
    one[String]("to_hex(to_utf8('ab'))") shouldBe "6162".toUpperCase
    one[String]("from_utf8(from_hex('6162'))") shouldBe "ab"
    one[String]("to_base64(to_utf8('x'))") shouldBe "eA=="
  }

  test("aggregate aliases") {
    import spark.implicits._
    val df = Seq(1, 2, 2, 3).toDF("x")
    df.createOrReplaceTempView("t_alias")
    spark.sql("SELECT approx_distinct(x) AS d FROM t_alias")
      .as[Long].head() shouldBe 3L
    spark.sql("SELECT arbitrary(x) AS a FROM t_alias")
      .as[Int].head() should be >= 1
  }

  test("vector similarity shims") {
    one[Double]("round(cosine_similarity_arr(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6)") shouldBe 1.0
    one[Double]("round(cosine_distance(array(1.0d, 0.0d), array(0.0d, 1.0d)), 6)") shouldBe 1.0
  }

  test("a realistic Presto-dialect query runs unchanged") {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    // mixes Presto spellings end to end: strpos, date_parse, try,
    // approx_distinct, arbitrary, split_to_map inputs, checksum
    val rows = spark.sql(
      """SELECT o_orderstatus,
        |  approx_distinct(o_custkey) AS nc,
        |  arbitrary(o_orderpriority) AS any_prio,
        |  count_if(strpos(o_orderpriority, 'URGENT') > 0) AS n_urgent,
        |  checksum(o_orderkey) AS cs,
        |  max(date_diff(DAY, o_orderdate,
        |    date_parse('2001-12-31', '%Y-%m-%d'))) AS max_days_left,
        |  max(try(1 div (o_orderkey - o_orderkey))) AS safe_null
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin).collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      r.getAs[Long]("nc") should be > 0L
      r.getAs[Long]("max_days_left") should be > 0L
      assert(r.isNullAt(r.fieldIndex("safe_null")))
    }
  }
}
