package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.TextAnalysis

/** Streaming entropy gate == batch q138 recompute at every step of a
  * replayed document changelog. Both sides call the SAME
  * [[TextAnalysis.charEntropyReport]] aggregation, so the pin here is
  * the view plumbing (touched-key rederivation, retraction, the
  * empty-text no-row rule). */
class StreamingEntropySpec extends SparkSuite {
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

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] =
    if (state.isEmpty) Map.empty
    else TextAnalysis.charEntropyReport(
        state.toDF("doc_id", "text"), "doc_id")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] = {
    val fields = Seq("n_cp", "n_distinct", "entropy_bits", "low_entropy")
    sink.docs("entropy_gate")
      .map { case (id, d) => id -> fields.map(d(_)) }.toMap
  }

  test("entropy report == batch recompute per micro-batch; verdict flips " +
      "on edit; empty text and deletes retract") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sentropy")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingEntropy.entropyView()))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch q138 recompute")
    }

    state = Map("d1" -> "the quick brown fox jumps", "d2" -> "aaaaaaaa")
    step(0, create("d1", "the quick brown fox jumps"),
      create("d2", "aaaaaaaa"))
    assert(sinkDocs(sink)("d1").last == false, "prose clears the gate")
    assert(sinkDocs(sink)("d2").last == true, "key-mash is flagged")
    assert(sinkDocs(sink)("d2")(2) == 0.0, "single-char padding is 0 bits")

    // a key-mash doc edited into prose flips its verdict
    state = Map("d1" -> "the quick brown fox jumps",
      "d2" -> "now a real sentence with words")
    step(1, update("d2", "aaaaaaaa", "now a real sentence with words"))
    assert(sinkDocs(sink)("d2").last == false)

    // an edit to EMPTY text retracts the row (no-row rule), a delete
    // retracts the other
    state = Map.empty
    step(2, update("d2", "now a real sentence with words", ""),
      delete("d1", "the quick brown fox jumps"))
    assert(sinkDocs(sink).isEmpty)
  }
}
