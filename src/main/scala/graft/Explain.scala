package graft

/** Dev tool: print a query's formatted physical plan. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
