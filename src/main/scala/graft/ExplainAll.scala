package graft

/** Dev tool: dump `.explain("formatted")` for queries to files.
  * Usage: runMain graft.ExplainAll <outDir> <suffix> [name ...]
  * With no names, dumps every declared query. Writes
  * <outDir>/<name>_<suffix>.txt per query. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.all.map(_.name)
    val spark = Engine.session("graft-explain-all")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain-all] $name failed: $e")
      } finally CacheScope.drainWithCheckpoints(spark)
    }
    spark.stop()
  }
}
