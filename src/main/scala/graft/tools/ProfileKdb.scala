package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: repeat-timing of join_spatial_kdb variants at a given SF
  * dir to find where its wall time goes. Not part of the library.
  */
object ProfileKdb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("profile-kdb")
    def time[A](label: String)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    time("full")(graft.queries.Spatial.defs("join_spatial_kdb").build(spark, dir).collect())
    time("arith")(variantArith(spark, dir).collect())
    spark.stop()
  }

  /** Same KDB pipeline but the refine distance is plain arithmetic. */
  def variantArith(s: SparkSession, dir: String) = {
    import s.implicits._
    val r = 0.45
    val cust = graft.Tables.customer(s, dir).select($"c_custkey",
        (($"c_custkey" % 100) * 0.2 + 0.05).as("px"),
        ($"c_nationkey" * 0.8 + 0.05).as("py"))
      .withColumn("pt", expr("concat('POINT (', px, ' ', py, ')')"))
    val sup = graft.Tables.supplier(s, dir).select($"s_suppkey",
        (($"s_suppkey" % 100) * 0.2 + 0.05).as("sx"),
        ($"s_nationkey" * 0.8 + 0.05).as("sy"))
      .withColumn("spt", expr("concat('POINT (', sx, ' ', sy, ')')"))
    val treeDf = sup.agg(expr("spatial_partitioning(spt, 16)").as("tree"))
    val supP = sup.crossJoin(broadcast(treeDf))
      .withColumn("pid", explode(expr(s"spatial_partitions(tree, spt, $r)")))
      .drop("tree")
    val custP = cust.crossJoin(broadcast(treeDf))
      .withColumn("pid", explode(expr("spatial_partitions(tree, pt)")))
      .drop("tree")
    supP.join(custP, Seq("pid"))
      .withColumn("dist", sqrt(pow($"sx" - $"px", 2) + pow($"sy" - $"py", 2)))
      .filter($"dist" < r)
      .select($"s_suppkey", $"c_custkey", $"dist").distinct()
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"s_suppkey").as("n_sup"),
        round(min($"dist"), 4).as("min_dist"),
        round(max($"dist"), 4).as("max_dist"))
  }
}
