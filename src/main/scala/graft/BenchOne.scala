package graft

/** Dev tool: time ONE query N times in a single warm JVM — for isolating
  * a query's cost from the full-suite run-order and page-cache effects
  * `Bench` is exposed to. Usage: runMain graft.BenchOne <name> [n] [sfDir]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench-one")
    spark.sparkContext.setLogLevel("WARN")
    val times = (0 until n).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.drainWithCheckpoints(spark) // same per-query discipline as Bench
      sec
    }
    println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")} " +
      f"min=${times.min}%.2f median=${times.sorted.apply(n / 2)}%.2f")
    spark.stop()
  }
}
