package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Curation

/** Streaming C4 gate == batch q128 recompute at every step of a
  * replayed document changelog. Both sides call the SAME
  * [[Curation.c4Report]] columns, so the pin here is the view plumbing
  * (touched-key rederivation, retraction), not a second rule
  * implementation. */
class StreamingC4Spec extends SparkSuite {
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

  // numeric doc keys so the plant schedule fires: 13 plants lorem ipsum,
  // 17 plants a brace, 11 plants javascript on line 0
  private val longDoc = (0 until 40).map(i => s"word$i").mkString(" ")

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] = {
    if (state.isEmpty) Map.empty
    else Curation.c4Report(state.toDF("doc_id", "text"),
        col("doc_id"), col("doc_id").cast("long"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] = {
    val fields = Seq("n_lines", "n_kept", "page_keep", "cleaned")
    sink.docs("c4_gate").map { case (id, d) => id -> fields.map(d(_)) }.toMap
  }

  test("streaming gate equals batch recompute after every batch; " +
      "replay is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sc4")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingC4.c4View()))

    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    step(0, create("4", longDoc), create("13", longDoc), create("17", longDoc))
    val s0 = Seq("4" -> longDoc, "13" -> longDoc, "17" -> longDoc)
    assert(sinkDocs(sink) == expected(s0))
    // the lorem-ipsum plant (doc 13) must page-drop, the clean doc keep
    assert(sinkDocs(sink)("13")(2) == false)
    assert(sinkDocs(sink)("4")(2) == true)

    // update re-derives, delete retracts
    step(1, update("4", longDoc, "short text"), delete("17", longDoc))
    val s1 = Seq("4" -> "short text", "13" -> longDoc)
    assert(sinkDocs(sink) == expected(s1))

    // replay converges
    step(1, update("4", longDoc, "short text"), delete("17", longDoc))
    assert(sinkDocs(sink) == expected(s1))
  }
}
