package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BoundedTopNSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("max_n returns the n largest values in descending order") {
    import spark.implicits._
    val df = Seq(1.0, 5.0, 3.0, 9.0, 7.0, 2.0).toDF("x")
    val got = df.selectExpr("max_n(x, 3) AS top").as[Seq[Double]].head()
    got shouldBe Seq(9.0, 7.0, 5.0)
  }

  test("min_n returns the n smallest values in ascending order") {
    import spark.implicits._
    val df = Seq(4.0, 1.0, 8.0, 0.5).toDF("x")
    val got = df.selectExpr("min_n(x, 2) AS bot").as[Seq[Double]].head()
    got shouldBe Seq(0.5, 1.0)
  }

  test("n larger than the group returns all values") {
    import spark.implicits._
    val got = Seq(2.0, 1.0).toDF("x")
      .selectExpr("max_n(x, 10) AS top").as[Seq[Double]].head()
    got shouldBe Seq(2.0, 1.0)
  }

  test("nulls are skipped") {
    import spark.implicits._
    val got = Seq(Some(3.0), None, Some(1.0)).toDF("x")
      .selectExpr("max_n(x, 5) AS top").as[Seq[Double]].head()
    got shouldBe Seq(3.0, 1.0)
  }

  test("merge across many partitions matches a full sort (serde path)") {
    import spark.implicits._
    val df = spark.range(0, 10000).repartition(32)
      .select((pmod(hash($"id"), lit(100000)).cast("double")).as("x"))
    val viaAgg = df.selectExpr("max_n(x, 7) AS top").as[Seq[Double]].head()
    val viaSort = df.orderBy($"x".desc).limit(7).as[Double].collect().toSeq
    viaAgg shouldBe viaSort
  }

  test("grouped max_n matches per-group sort") {
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select(($"id" % 5).as("g"), ($"id" * 17 % 997).cast("double").as("x"))
      .repartition(8)
    val agg = df.groupBy($"g").agg(expr("max_n(x, 3)").as("top"))
      .as[(Long, Seq[Double])].collect().toMap
    val expected = df.as[(Long, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted(Ordering[Double].reverse).take(3).toSeq).toMap
    agg shouldBe expected
  }
}
