package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Maintained token counts == a from-scratch count over the corpus's
  * CURRENT images after every batch (creates, re-texting updates,
  * deletes — all retract exactly), the top-k read matches batch q62's
  * report shape, and a replayed batch is a no-op. */
class StreamingTopTokensSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(op: String, id: String, text: String) = {
    seqNo += 1
    val after =
      if (op == "d") "null"
      else s"""{"doc_id":"$id","text":"$text"}"""
    val before =
      if (op == "c") "null"
      else s"""{"doc_id":"$id","text":"-"}"""
    ("documents",
      s"""{"before":$before,"after":$after,"op":"$op","ts_ms":$seqNo}""",
      seqNo)
  }

  private def sinkCounts(sink: InMemoryUpsertSink): Map[String, Long] =
    sink.docs("token_counts").map { case (id, d) =>
      id -> d("cnt").asInstanceOf[Long]
    }.toMap

  test("counts track current corpus images through create/update/delete") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("stok")
    val counts = StreamingTopTokens.tokenCounts(spark, stateDir)
    val pipeline =
      new CdcPipeline(spark, sources, stateDir, sink, Seq(counts.view))

    val current = scala.collection.mutable.Map.empty[String, String]
    def step(batchId: Long, recs: ((String, String, Long), (String, String))*)
        : Unit = {
      recs.foreach { case (_, (id, text)) =>
        if (text == null) current.remove(id) else current(id) = text
      }
      pipeline.processBatch(
        recs.map(_._1).toDF("table", "value", "seq"), Some(batchId))
      val expected = current.values.toSeq match {
        case Nil => Map.empty[String, Long]
        case texts => texts.toDF("text")
          .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
          .groupBy("tok").count()
          .as[(String, Long)].collect().toMap
      }
      assert(sinkCounts(sink) == expected,
        s"batch $batchId: sink counts != batch recompute")
      val topK = counts.topTokens(3).as[(String, Long)].collect().toSeq
      val expectedTop = expected.toSeq
        .sortBy { case (t, n) => (-n, t) }.take(3)
      assert(topK == expectedTop, s"batch $batchId: top-k mismatch")
    }

    def c(id: String, text: String) = (rec("c", id, text), (id, text))
    def u(id: String, text: String) = (rec("u", id, text), (id, text))
    def d(id: String) = (rec("d", id, null), (id, null: String))

    step(0, c("d1", "alpha beta beta"), c("d2", "beta gamma"))
    step(1, u("d1", "alpha delta"))          // beta×2 retract, delta enters
    step(2, d("d2"))                         // beta leaves entirely
    assert(!sinkCounts(sink).contains("beta"),
      "count-0 token must be deleted from the sink")
    step(3, c("d3", "alpha alpha epsilon"))
  }

  test("replayed batch leaves counts and state unchanged") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("stok-replay")
    val counts = StreamingTopTokens.tokenCounts(spark, stateDir)
    val pipeline =
      new CdcPipeline(spark, sources, stateDir, sink, Seq(counts.view))

    pipeline.processBatch(
      Seq(rec("c", "r1", "one two two")).toDF("table", "value", "seq"),
      Some(0L))
    val b1 = Seq(rec("c", "r2", "two three")).toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkCounts(sink)
    assert(after == Map("one" -> 1L, "two" -> 3L, "three" -> 1L))

    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(sinkCounts(sink) == after, "replay must not double-count")
    assert(counts.topTokens(2).as[(String, Long)].collect().toSeq ==
      Seq(("two", 3L), ("one", 1L)))
  }
}
