package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Curation

/** Streaming PII scrub == batch recompute at every step of a replayed
  * document changelog — including updates that add/remove PII, deletes
  * retracting their sink rows, and redelivered batches replaying
  * idempotently. Unlike the q93 gate (which injects deterministic PII
  * into the synthetic corpus), this exercises the scrub on real
  * PII-bearing text end-to-end. */
class StreamingPiiSpec extends SparkSuite {
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

  private val tA = "reach me at alice.w@corp.example.org or 555-0142 thanks"
  private val tA2 = "reach me at [removed] or [removed] thanks"
  private val tB = "server 10.0.12.34 and backup 192.168.1.250 rotate daily"
  private val tC = "no sensitive content in this one at all"
  private val tD = "bob+spam@mail.example.com met carol_x@a.b.co at 10.1.1.1"

  private def expected(state: Seq[(String, String)]): Map[String, (Long, Long, Long, String)] = {
    if (state.isEmpty) Map.empty
    else state.toDF("doc_id", "text")
      .select(col("doc_id") +: Curation.piiColumns(col("text")): _*)
      .as[(String, Long, Long, Long, String)].collect()
      .map { case (id, e, p, i, sig) => id -> (e, p, i, sig) }.toMap
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, (Long, Long, Long, String)] =
    sink.docs("pii_scrub").map { case (id, d) =>
      id -> (d("n_emails").asInstanceOf[Long], d("n_phones").asInstanceOf[Long],
        d("n_ips").asInstanceOf[Long], d("clean_sig").toString)
    }.toMap

  test("streaming scrub equals batch recompute after every batch; " +
      "replay is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("spii")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingPii.piiView()))

    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    // batch 0: two PII docs + one clean doc
    step(0, create("a", tA), create("b", tB), create("c", tC))
    assert(sinkDocs(sink) == expected(Seq("a" -> tA, "b" -> tB, "c" -> tC)))
    val afterB0 = sinkDocs(sink)
    assert(afterB0("a")._1 == 1 && afterB0("a")._2 == 1, "email+phone in a")
    assert(afterB0("b")._3 == 2, "two IPs in b")
    assert(afterB0("c") == (0L, 0L, 0L, afterB0("c")._4), "c is clean")

    // batch 1: scrubbing an update removes counts; a new multi-PII doc
    step(1, update("a", tA, tA2), create("d", tD))
    assert(sinkDocs(sink) ==
      expected(Seq("a" -> tA2, "b" -> tB, "c" -> tC, "d" -> tD)))
    assert(sinkDocs(sink)("a")._1 == 0 && sinkDocs(sink)("d")._1 == 2)

    // batch 2: delete retracts the sink row
    step(2, delete("b", tB))
    assert(sinkDocs(sink) == expected(Seq("a" -> tA2, "c" -> tC, "d" -> tD)))

    // redelivery of batch 2 (crash-replay) must change nothing
    step(2, delete("b", tB))
    assert(sinkDocs(sink) == expected(Seq("a" -> tA2, "c" -> tC, "d" -> tD)))
  }
}
