package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.TextAnalysis

/** Streaming mojibake gate == batch q148 recompute at every step of a
  * replayed document changelog. Both sides call the SAME
  * [[TextAnalysis.mojibakeReport]] columns (the view gates the text
  * that arrives — no doc_id plant), so the pin here is the view
  * plumbing: touched-key rederivation, verdict flips on edit,
  * retraction on delete. */
class StreamingMojibakeSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] =
    if (state.isEmpty) Map.empty
    else TextAnalysis.mojibakeReport(state.toDF("doc_id", "text"), "doc_id")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] = {
    val fields = Seq("n_cp", "n_repl", "n_ctrl", "keep")
    sink.docs("mojibake_gate")
      .map { case (id, d) => id -> fields.map(d(_)) }.toMap
  }

  test("gate == batch recompute per micro-batch; verdict flips when a " +
      "re-decode fixes the text; row retracts on delete") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("smoji")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingMojibake.mojibakeView()))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch q148 recompute")
    }

    val clean = "a perfectly ordinary sentence of text"
    val broken = "short " + "\uFFFD" * 4 // 4 repl of 10 cp: drop
    state = Map("d1" -> clean, "d2" -> broken)
    step(0, create("d1", clean), create("d2", broken))
    assert(sinkDocs(sink)("d1").last == true)
    assert(sinkDocs(sink)("d2").last == false)
    assert(sinkDocs(sink)("d2")(1) == 4L) // n_repl

    // the upstream re-decode event: the fixed text flips the verdict
    val fixed = "short but now decoded correctly"
    state = Map("d1" -> clean, "d2" -> fixed)
    step(1, update("d2", broken, fixed))
    assert(sinkDocs(sink)("d2").last == true)

    // control-byte damage counts through the other metric. The CDC
    // envelope is JSON, where control chars MUST travel as \uXXXX
    // escapes (raw bytes are invalid JSON and Debezium escapes them) —
    // so the wire form and the decoded state form differ here
    val ctrl = "tiny\u0001\u0002" // decoded: 2 ctrl of 6 cp -> drop
    val ctrlWire = "tiny\\u0001\\u0002" // JSON-escaped wire spelling
    state += ("d3" -> ctrl)
    step(2, ("documents",
      s"""{"before":null,"after":{"doc_id":"d3","text":"$ctrlWire"},"op":"c","ts_ms":99}""",
      99L))
    assert(sinkDocs(sink)("d3")(2) == 2L) // n_ctrl
    assert(sinkDocs(sink)("d3").last == false) // 200 < 6 fails

    state -= "d2"
    step(3, delete("d2", fixed))
    assert(!sinkDocs(sink).contains("d2"))

    // replay idempotence
    pipeline.processBatch(Seq(delete("d2", fixed))
      .toDF("table", "value", "seq"), Some(3L))
    assert(sinkDocs(sink) == expected(state.toSeq))
  }
}
