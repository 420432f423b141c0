package graft.tools
object PushdownProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("pushdown-probe")
    val df = graft.Tables.parallelized(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.1"))
    df.createOrReplaceTempView("li_par")
    val q = spark.sql(
      "SELECT sum(l_extendedprice * l_discount) FROM li_par " +
      "WHERE l_shipdate >= DATE '1994-01-01' AND l_quantity < 24")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println(plan.split("\n").filter(l =>
      l.contains("PushedFilters") || l.contains("Exchange") ||
      l.contains("Scan parquet")).mkString("\n"))
    spark.stop()
  }
}
