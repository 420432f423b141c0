package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PointCodecSimplification correctness: the rewrite replaces a
  * format-then-regex-parse round trip with the raw coordinate, so
  * st_x/st_y/st_distance over constructed points must stay exact for
  * every double regime the codec would have rendered differently
  * (scientific notation, negatives, -0.0, NaN, infinities, nulls).
  */
class PointCodecSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def d(sql: String): Any = spark.sql(s"SELECT $sql").head().get(0)

  test("st_x/st_y over st_point are exact for tricky double values") {
    for (v <- Seq(0.05, -3.75, 1.0e-7, -2.5e17, 12345.6789, 0.0)) {
      d(s"st_x(st_point(cast($v AS DOUBLE), 1.0D))") shouldBe v
      d(s"st_y(st_point(1.0D, cast($v AS DOUBLE)))") shouldBe v
    }
    d("st_x(st_point(cast('NaN' AS DOUBLE), 1.0D))")
      .asInstanceOf[Double].isNaN shouldBe true
    d("st_x(st_point(cast('Infinity' AS DOUBLE), 1.0D))") shouldBe
      Double.PositiveInfinity
    assert(d("st_x(st_point(cast(NULL AS DOUBLE), 1.0D))") == null)
  }

  test("st_distance over constructed points matches direct arithmetic") {
    val rows = spark.sql(
      """SELECT id,
        |  st_distance(st_point(x1, y1), st_point(x2, y2)) AS viafn,
        |  sqrt(power(x1 - x2, 2) + power(y1 - y2, 2)) AS direct
        |FROM (SELECT id,
        |        cast(id * 0.37 AS DOUBLE) AS x1, cast(id * -1.21 AS DOUBLE) AS y1,
        |        cast(id * 2.04e-3 AS DOUBLE) AS x2, cast(id * 7.7 AS DOUBLE) AS y2
        |      FROM range(1, 200) t(id))""".stripMargin).collect()
    rows.foreach { r =>
      r.getDouble(1) shouldBe r.getDouble(2)
    }
  }

  test("the rewrite does not fire on genuine WKT column parses") {
    // st_x over a column holding WKT text (not an inline st_point)
    // must still regex-parse — and still be correct
    import spark.implicits._
    val df = Seq("POINT (3.5 -1.25)", "POINT (0.0 9.0)").toDF("wkt")
    df.createOrReplaceTempView("wkt_pts")
    val got = spark.sql("SELECT st_x(wkt), st_y(wkt) FROM wkt_pts ORDER BY wkt")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    got shouldBe Seq((0.0, 9.0), (3.5, -1.25))
  }
}
