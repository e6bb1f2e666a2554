package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.TextAnalysis

/** Streaming entropy gate == batch q138 recompute at every step of a
  * replayed document changelog. Both sides call the SAME
  * [[TextAnalysis.charEntropyReport]] aggregation, so the pin here is
  * the view plumbing (touched-key rederivation, retraction, the
  * empty-text no-row rule). */
class StreamingEntropySpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

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
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
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
