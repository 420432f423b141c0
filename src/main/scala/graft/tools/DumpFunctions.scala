package graft.tools

/** Dev tool: dump every function name resolvable in a GraftSession
  * (our catalogs plus Spark builtins) for coverage diffs against the
  * reference's registry. Not part of the library surface.
  */
object DumpFunctions {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("dump-functions")
    val names = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName.toLowerCase).distinct.sorted
    java.nio.file.Files.write(
      java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/graft_fn_names.txt")),
      names.mkString("\n").getBytes("UTF-8"))
    println(s"[dump] ${names.size} functions")
    spark.stop()
  }
}
