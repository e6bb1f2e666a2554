package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** The maintained Count-Min sketch == a from-scratch
  * [[graft.functions.CountMinAgg]] sketch of the live corpus at every
  * step of a replayed changelog — CELL-level equality (the turnstile
  * claim: inserts, updates and deletes all land exactly), empty-corpus
  * retraction, and idempotent replay. */
class StreamingCmsSpec extends SparkSuite {
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
  private def create(id: String, text: String) =
    rec(s"""{"before":null,"after":${img(id, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, o: String, n: String) =
    rec(s"""{"before":${img(id, o)},"after":${img(id, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String) =
    rec(s"""{"before":${img(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def expectedCells(state: Seq[String]): Map[Long, Long] = {
    if (state.isEmpty) return Map.empty
    val sk = state.toDF("text")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .agg(graft.functions.CountMinAgg.sketch(col("tok"), 4, 256).as("sk"))
      .collect()(0).getSeq[Long](0)
    sk.zipWithIndex.collect { case (c, i) if c != 0 => (i.toLong, c) }.toMap
  }

  private def sinkCells(sink: InMemoryUpsertSink): Map[Long, Long] =
    sink.docs("cms_sketch").map { case (id, d) =>
      id.toLong -> d("cnt").asInstanceOf[Long]
    }.toMap

  test("maintained sketch equals batch recompute after every batch; " +
      "retracts to empty; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scms")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingCms.cmsView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    step(0, create("a", "the cat sat on the mat"),
      create("b", "the dog sat"))
    assert(sinkCells(sink) ==
      expectedCells(Seq("the cat sat on the mat", "the dog sat")))

    // update retracts b's old tokens exactly
    step(1, update("b", "the dog sat", "a completely different corpus"),
      create("c", "the cat sat"))
    val live1 = Seq("the cat sat on the mat",
      "a completely different corpus", "the cat sat")
    assert(sinkCells(sink) == expectedCells(live1))

    // replay of batch 1 converges to the same cells
    step(1, update("b", "the dog sat", "a completely different corpus"),
      create("c", "the cat sat"))
    assert(sinkCells(sink) == expectedCells(live1))

    // deleting everything drains every counter to zero
    step(2, delete("a", "the cat sat on the mat"),
      delete("b", "a completely different corpus"),
      delete("c", "the cat sat"))
    assert(sinkCells(sink).isEmpty)
  }
}
