package graft.tools

/** Dev tool: print analyzed + optimized logical plans of a query. */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = if (args.length > 1) args(1) else "join_spatial_kdb"
    val spark = graft.GraftSession.build("dump-plan")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println("==== OPTIMIZED ====")
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
