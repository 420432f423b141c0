package graft

/** Dev tool: print the executed plan and timing for one registered
  * query. Usage: runMain graft.Explain <queryName> [sfDir] [format]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = GraftSession.build("graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain(mode)
    val t0 = System.nanoTime()
    val n = df.count()
    System.err.println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    df.count()
    System.err.println(f"[explain] $name: warm rerun ${(System.nanoTime() - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
