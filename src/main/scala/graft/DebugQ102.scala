package graft

import org.apache.spark.sql.functions._

/** Dev scratch: isolate q102's per-stage cost. */
object DebugQ102 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-debug")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val dc0 = docs
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.NGrams.wordGrams(col("text"), 2)).as("g"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(1024L)).as("b"))
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("c"))
    time("dc compute (no cache), noop") {
      dc0.write.format("noop").mode("overwrite").save()
    }
    println(s"[debug] dc rows: ${time("dc count uncached")(dc0.count())}")
    val dc = dc0.persist()
    time("dc cache materialize (count)")(dc.count())
    time("dc cache re-count")(dc.count())
    time("rf agg from cache") {
      dc.groupBy("b").agg(sum("c").as("rc"))
        .write.format("noop").mode("overwrite").save()
    }
    time("rf agg from cache 2") {
      dc.groupBy("b").agg(sum("c").as("rc"))
        .write.format("noop").mode("overwrite").save()
    }
    time("plain scan from cache (project b)") {
      dc.select(col("b")).write.format("noop").mode("overwrite").save()
    }
    // baseline: cache read speed of a shuffle-free 250K-row frame
    val flat = spark.range(250000)
      .selectExpr("id AS doc_id", "'en' AS lang", "id % 1024 AS b",
        "id % 7 AS c").persist()
    time("flat cache materialize (count)")(flat.count())
    time("flat cache re-count")(flat.count())
    time("flat agg from cache") {
      flat.groupBy("b").agg(sum("c")).write.format("noop").mode("overwrite").save()
    }
    // dc rebuilt with AQE off: does the cached-AQE-subplan explain it?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dc2 = dc0.groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("c2"))
    val dcNoAqe = dc0.persist()
    // NOTE: dc0 already cached above — use a distinct plan
    val dc3 = docs
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.NGrams.wordGrams(col("text"), 2)).as("g"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(1024L)).as("b"))
      .groupBy("doc_id", "b", "lang")
      .agg(count(lit(1)).as("c"))
      .persist()
    time("dc-noAQE cache materialize (count)")(dc3.count())
    time("dc-noAQE cache re-count")(dc3.count())
    time("dc-noAQE agg from cache") {
      dc3.groupBy("b").agg(sum("c")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
