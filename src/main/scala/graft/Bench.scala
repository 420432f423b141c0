package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.contains).toMap
      else SparkEntry.queries
    // Unmeasured warmup: the first executed query otherwise pays
    // several seconds of JVM/JIT/session initialization, which showed
    // up as a phantom 10x outlier on whichever query ran first.
    try { SparkEntry.queries("tpch_q1")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of two runs: single-shot timings at this scale carry up to
      // ±50% JIT/GC noise, which would read as phantom regressions
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val d = (System.nanoTime() - t0) / 1e9
        // bench hygiene: queries that CACHE tables or register views
        // must not bleed storage/GC pressure into later measurements
        spark.catalog.clearCache()
        d
      }.min
      System.err.println(f"[bench] $name%-30s $dt%8.2fs")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
