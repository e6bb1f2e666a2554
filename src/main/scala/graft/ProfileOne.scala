package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Dev tool: run ONE query (1 warm-up + 1 timed) and print a per-job /
  * per-stage wall breakdown of the timed run, so a query's seconds are
  * attributable to stages instead of guessed.
  * Usage: runMain graft.ProfileOne <name> [sfDir]. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-profile-one")
    spark.sparkContext.setLogLevel("WARN")

    // warm-up
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    CacheScope.drainWithCheckpoints(spark)

    final case class St(var name: String = "", var submit: Long = 0,
        var done: Long = 0, var tasks: Int = 0, var taskTimeMs: Long = 0,
        var runMs: Long = 0, var gcMs: Long = 0, var deserMs: Long = 0,
        var cpuMs: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, Seq[Int])]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs(e.jobId) = (e.time, 0L, e.stageIds)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach { case (s, _, ids) =>
          jobs(e.jobId) = (s, e.time, ids) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo.stageId
        val st = stages.getOrElseUpdate(i, St())
        st.name = e.stageInfo.name.linesIterator.next().take(120)
        st.submit = e.stageInfo.submissionTime.getOrElse(0L)
        st.done = e.stageInfo.completionTime.getOrElse(0L)
        st.tasks = e.stageInfo.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val st = stages.getOrElseUpdate(e.stageId, St())
        if (e.taskInfo != null) st.taskTimeMs += e.taskInfo.duration
        if (e.taskMetrics != null) {
          st.runMs += e.taskMetrics.executorRunTime
          st.gcMs += e.taskMetrics.jvmGCTime
          st.deserMs += e.taskMetrics.executorDeserializeTime
          st.cpuMs += e.taskMetrics.executorCpuTime / 1000000L
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    CacheScope.drainWithCheckpoints(spark)
    spark.sparkContext.removeSparkListener(listener)

    println(f"== $name timed run: $sec%.3f s, ${jobs.size} jobs, ${stages.size} stages ==")
    var lastEnd = 0L
    jobs.toSeq.sortBy(_._1).foreach { case (jid, (s, e, ids)) =>
      val gap = if (lastEnd > 0) s - lastEnd else 0L
      println(f"job $jid%3d  ${(e - s) / 1e3}%7.3f s  (driver gap before: ${gap / 1e3}%6.3f s)  stages=${ids.mkString(",")}")
      lastEnd = e
    }
    println("-- stages (wall desc) --")
    stages.toSeq.sortBy(-_._2.taskTimeMs).take(30).foreach { case (i, st) =>
      println(f"stage $i%4d  wall=${(st.done - st.submit) / 1e3}%7.3f s  taskSum=${st.taskTimeMs / 1e3}%7.3f s  run=${st.runMs / 1e3}%7.3f cpu=${st.cpuMs / 1e3}%7.3f gc=${st.gcMs / 1e3}%6.3f deser=${st.deserMs / 1e3}%6.3f  tasks=${st.tasks}%3d  ${st.name}")
    }
    spark.stop()
  }
}
