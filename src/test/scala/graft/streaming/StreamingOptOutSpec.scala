package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Provenance

/** Streaming opt-out gate == batch q149 recompute at every step of a
  * replayed document changelog. Both sides call the SAME
  * [[Provenance.registeredDomain]]/[[Provenance.optedOut]] columns, so
  * the pin here is the view plumbing: touched-key rederivation,
  * retraction on delete, and the (none)-equivalent null-domain pass. */
class StreamingOptOutSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private def expected(
      state: Seq[(String, String)]): Map[String, (Option[String], Boolean)] =
    if (state.isEmpty) Map.empty
    else state.toDF("doc_id", "text")
      .select(col("doc_id"),
        Provenance.registeredDomain(col("doc_id").cast("long")).as("rd"))
      .withColumn("out", Provenance.optedOut(col("rd")))
      .as[(String, Option[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def sinkDocs(
      sink: InMemoryUpsertSink): Map[String, (Option[String], Boolean)] =
    sink.docs("optout_gate").map { case (id, d) =>
      id -> ((Option(d("registered_domain")).map(_.toString),
        d("opted_out").asInstanceOf[Boolean]))
    }.toMap

  test("gate == batch recompute; opted-out publishers flag, bare-suffix " +
      "ids pass, rows retract on delete, replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("soptout")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingOptOut.optOutView()))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch q149 recompute")
    }

    // 24 -> site4.com (opted out), 25 -> allowed, 194 -> foo.ck, a
    // *.ck wildcard bare suffix (null registered domain); 97 is the
    // !www.ck exception trap — registrable but NOT on the opt-out list
    state = Map("24" -> "a", "25" -> "b", "194" -> "c", "97" -> "d")
    step(0, create("24", "a"), create("25", "b"), create("194", "c"),
      create("97", "d"))
    assert(sinkDocs(sink)("24") == ((Some("site4.com"), true)))
    assert(sinkDocs(sink)("25")._2 == false)
    assert(sinkDocs(sink)("194") == ((None, false)))
    assert(sinkDocs(sink)("97") == ((Some("www.ck"), false)))

    state -= "24"
    step(1, delete("24", "a"))
    assert(!sinkDocs(sink).contains("24"))

    // replay idempotence
    pipeline.processBatch(Seq(delete("24", "a"))
      .toDF("table", "value", "seq"), Some(1L))
    assert(sinkDocs(sink) == expected(state.toSeq))
  }
}
