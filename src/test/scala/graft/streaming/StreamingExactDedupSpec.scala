package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Incremental exact-dup groups == batch q20 recompute at every step of
  * a replayed changelog — survivor hand-off on delete, group moves on
  * update, emptied-group retraction, idempotent replay. */
class StreamingExactDedupSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String) =
    s"""{"doc_id":"$id","text":"$text"}"""
  private def create(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, oldT: String, newT: String): (String, String, Long) =
    rec(s"""{"before":${img(id, oldT)},"after":${img(id, newT)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":${img(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def batchRecompute(state: DataFrame): Set[(String, String, Long)] =
    state.groupBy(sha2(col("text"), 256).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
      .as[(String, String, Long)].collect().toSet

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, String, Long)] =
    sink.docs("exact_dedup").values.map { d =>
      (d("fp").toString, d("keep_id").toString,
        d("dup_cnt").asInstanceOf[Long])
    }.toSet

  test("incremental groups equal batch q20 recompute; survivor hand-off " +
      "and emptied-group retraction") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sexact")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingExactDedup.exactDedupView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    step(0, create("a1", "same text"), create("a2", "same text"),
      create("b1", "other text"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("a1", 2L), ("b1", 1L)))

    // deleting the survivor hands keep_id to a2
    step(1, delete("a1", "same text"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("a2", 1L), ("b1", 1L)))

    // update moves a doc between groups: one group grows, one empties
    step(2, update("b1", "other text", "same text"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) == Set(("a2", 2L)))

    step(3, delete("a2", "same text"), delete("b1", "same text"))
    assert(sinkRows(sink).isEmpty)
  }

  test("replayed batch is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sexact-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingExactDedup.exactDedupView(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", "dup body"))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", "dup body"), create("r3", "solo"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after.map(r => (r._2, r._3)) == Set(("r1", 2L), ("r3", 1L)))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }
}
