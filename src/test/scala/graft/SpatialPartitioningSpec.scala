package graft

import graft.functions.KdbTree
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** spatial_partitioning / spatial_partitions — KDB-tree learning and
  * assignment. Cluster-critical properties: the learned tree is a set
  * function of the input (partition-order invariant), every point
  * lands in exactly one leaf, an envelope spanning a split lands in
  * all leaves it touches, and the distance form guarantees co-location
  * of within-distance pairs.
  */
class SpatialPartitioningSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def tree(pts: Seq[(Double, Double)], parts: Int, shuffle: Int): String = {
    import spark.implicits._
    pts.toDF("x", "y").repartition(shuffle)
      .agg(expr(s"spatial_partitioning(concat('POINT (', x, ' ', y, ')'), $parts)"))
      .as[String].head()
  }

  test("learned tree is partition-order invariant and splits at lower medians") {
    val pts = for (i <- 0 until 40; j <- 0 until 10) yield (i * 1.0, j * 1.0)
    val t1 = tree(pts, 8, 1)
    tree(scala.util.Random.shuffle(pts.toList), 8, 13) shouldBe t1
    // root splits on x at the lower median of 0..39 (each x repeated
    // 10 times; element index (400-1)/2 = 199 → x = 19)
    val root = KdbTree.fromJson(t1).asInstanceOf[KdbTree.Split]
    root.axis shouldBe 0
    root.at shouldBe 19.0
  }

  test("points land in exactly one leaf; counts are balanced on uniform data") {
    import spark.implicits._
    val pts = for (i <- 0 until 32; j <- 0 until 32) yield (i * 1.0, j * 1.0)
    val df = pts.toDF("x", "y")
      .withColumn("g", expr("concat('POINT (', x, ' ', y, ')')"))
    val t = tree(pts, 4, 4)
    val assigned = df.select(expr(s"spatial_partitions('$t', g)").as("pids"))
    assigned.select(expr("max(size(pids))"), expr("min(size(pids))"))
      .as[(Int, Int)].head() shouldBe ((1, 1))
    val counts = assigned.select(explode(col("pids")).as("pid"))
      .groupBy("pid").count().as[(Int, Long)].collect().toMap
    counts.keySet shouldBe Set(0, 1, 2, 3)
    // lower-median splits on an even grid are near- (not perfectly-)
    // balanced: every quarter within ±15% of 1024/4
    counts.values.sum shouldBe 1024L
    all(counts.values) should (be >= 217L and be <= 295L)
  }

  test("an envelope spanning a split maps to every leaf it touches") {
    val pts = for (i <- 0 until 16; j <- 0 until 16) yield (i * 1.0, j * 1.0)
    val t = tree(pts, 4, 2)
    val spanning = spark.sql(
      s"SELECT spatial_partitions('$t', 'POLYGON ((1 1, 14 1, 14 14, 1 14, 1 1))')")
      .head().getSeq[Int](0)
    spanning.sorted shouldBe Seq(0, 1, 2, 3)
  }

  test("distance form co-locates within-distance pairs") {
    import spark.implicits._
    val pts = for (i <- 0 until 20; j <- 0 until 20) yield (i * 1.0, j * 1.0)
    val t = tree(pts, 4, 2)
    // the 20×20 grid's root x-split is at 9 (lower median); (8, 5)
    // and (10, 5) straddle it at distance 2: plain assignment
    // separates them, the distance form shares a partition
    val df = Seq((8.0, 5.0), (10.0, 5.0)).toDF("x", "y")
      .withColumn("g", expr("concat('POINT (', x, ' ', y, ')')"))
      .select(expr(s"spatial_partitions('$t', g)").as("plain"),
        expr(s"spatial_partitions('$t', g, 2.0)").as("near"))
    val rows = df.as[(Seq[Int], Seq[Int])].collect()
    rows(0)._1.intersect(rows(1)._1) shouldBe empty
    rows(0)._2.intersect(rows(1)._2) should not be empty
  }
}
