package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.TextAnalysis

/** Streaming Gopher gate == batch q107 recompute at every step of a
  * replayed document changelog — updates flipping individual rules,
  * deletes retracting rows, and idempotent replay. Both sides call the
  * SAME [[TextAnalysis.gopherRules]] columns, so the pin here is the
  * view plumbing (touched-key rederivation, retraction), not a second
  * rule implementation. */
class StreamingGopherSpec extends SparkSuite {
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

  private val keepText = (0 until 60).map(i => s"the word$i").mkString(" ")
  private val shortText = "the a of tiny"
  private val noStop = (0 until 60).map(i => s"word$i only$i").mkString(" ")

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] = {
    if (state.isEmpty) Map.empty
    else TextAnalysis.gopherRules(
        state.toDF("doc_id", "text"), col("doc_id"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] = {
    val fields = Seq("n_tokens", "mean_word_len", "n_alpha_words",
      "n_symbols", "n_stopwords", "r_len", "r_word_len", "r_alpha",
      "r_symbol", "r_stop", "keep")
    sink.docs("gopher_gate").map { case (id, d) =>
      id -> fields.map(d(_))
    }.toMap
  }

  test("streaming gate equals batch recompute after every batch; " +
      "replay is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sgopher")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingGopher.gopherView()))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
    }

    step(0, create("a", keepText), create("b", shortText))
    assert(sinkDocs(sink) == expected(Seq("a" -> keepText, "b" -> shortText)))
    assert(sinkDocs(sink)("a").last == true)
    assert(sinkDocs(sink)("b").last == false)

    // update flips b's length rule on, but strips its stopwords
    step(1, update("b", shortText, noStop), create("c", keepText))
    assert(sinkDocs(sink) == expected(
      Seq("a" -> keepText, "b" -> noStop, "c" -> keepText)))
    assert(sinkDocs(sink)("b").last == false)

    // delete retracts the sink row
    step(2, delete("a", keepText))
    assert(sinkDocs(sink) == expected(Seq("b" -> noStop, "c" -> keepText)))

    // replay of batch 1 converges to the same sink
    val before = sinkDocs(sink)
    step(1, update("b", shortText, noStop), create("c", keepText))
    assert(sinkDocs(sink) == before)
  }
}
