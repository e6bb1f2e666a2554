package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Curation

/** Streaming blocklist gate == batch q139 recompute at every step of a
  * replayed document changelog. Both sides call the SAME
  * [[Curation.blocklistReport]] columns, so the pin here is the view
  * plumbing (touched-key rederivation, retraction), not a second rule
  * implementation. */
class StreamingBlocklistSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] =
    if (state.isEmpty) Map.empty
    else Curation.blocklistReport(state.toDF("doc_id", "text"),
        col("doc_id"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] = {
    val fields = Seq("n_tokens", "n_blocked", "matched_terms", "keep")
    sink.docs("blocklist_gate")
      .map { case (id, d) => id -> fields.map(d(_)) }.toMap
  }

  test("gate == batch recompute per micro-batch; verdict flips on edit, " +
      "row retracts on delete") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sblock")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingBlocklist.blocklistView()))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch q139 recompute")
    }

    val clean = "a b c d e f g h i j k"
    val dense = "slow hash vector slow x y z q w e"
    state = Map("d1" -> clean, "d2" -> dense)
    step(0, create("d1", clean), create("d2", dense))
    assert(sinkDocs(sink)("d1").last == true)
    assert(sinkDocs(sink)("d2").last == false)

    // an edit that pushes d1 over the density line flips its verdict
    val nowDense = "slow slow c d e f g h i j k"
    state = Map("d1" -> nowDense, "d2" -> dense)
    step(1, update("d1", clean, nowDense))
    assert(sinkDocs(sink)("d1").last == false)

    state = Map("d1" -> nowDense)
    step(2, delete("d2", dense))
    assert(!sinkDocs(sink).contains("d2"))

    // replay idempotence
    pipeline.processBatch(Seq(delete("d2", dense))
      .toDF("table", "value", "seq"), Some(2L))
    assert(sinkDocs(sink) == expected(state.toSeq))
  }
}
