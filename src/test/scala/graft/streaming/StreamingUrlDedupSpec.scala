package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Provenance

/** Incremental URL-level dedup == batch q147 recompute at every step of
  * a replayed changelog: ids whose synthetic URLs normalize identically
  * share a group (with n_raw_variants counting distinct raw spellings),
  * a text edit does NOT move a doc (the fingerprint reads the id, not
  * the text), survivor hand-off and emptied-group retraction work, and
  * replay is idempotent. */
class StreamingUrlDedupSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  /** Batch q147's aggregation over the materialized state keys —
    * NUMERIC min, the batch query's min(doc_id) semantics (the CDC key
    * is a string; lexicographic min elects the wrong survivor for
    * mixed-width ids: "10" < "9"). */
  private def batchRecompute(
      state: DataFrame): Set[(String, String, Long, Long)] = {
    val url = Provenance.syntheticUrl(col("doc_id").cast("long"))
    state.select(col("doc_id"), url.as("url"),
        Provenance.normalizeUrl(url).as("url_key"))
      .groupBy("url_key")
      .agg(min(col("doc_id").cast("long")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct("url").as("n_raw_variants"))
      .select(col("url_key"), col("keep_id").cast("string"),
        col("n_copies"), col("n_raw_variants"))
      .as[(String, String, Long, Long)].collect().toSet
  }

  private def sinkRows(
      sink: InMemoryUpsertSink): Set[(String, String, Long, Long)] =
    sink.docs("url_dedup").values.map { d =>
      (d("url_key").toString, d("keep_id").toString,
        d("n_copies").asInstanceOf[Long],
        d("n_raw_variants").asInstanceOf[Long])
    }.toSet

  test("url groups == batch q147 recompute; variant spellings group, " +
      "text edits don't move docs, survivor hand-off and retraction") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("surl")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingUrlDedup.urlDedupView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    // 103/153/203 ≡ mod 25 and mod 50: same normalized URL, spelled
    // three ways (103/203 carry www., 153 is bare, 203 adds a trailing
    // slash), so the group holds > 1 raw variant; 105 is a different
    // path — a singleton
    step(0, create("103", "text a"), create("153", "text b"),
      create("203", "text c"), create("105", "text d"))
    val g = sinkRows(sink)
    assert(g.map(r => (r._2, r._3)) == Set(("103", 3L), ("105", 1L)))
    assert(g.find(_._2 == "103").get._4 >= 2,
      "the trio must span raw spellings (www/scheme differ)")

    // a TEXT edit cannot move a doc between URL groups
    step(1, update("153", "text b", "completely new text"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("103", 3L), ("105", 1L)))

    // deleting the survivor hands keep_id to the next member
    step(2, delete("103", "text a"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("153", 2L), ("105", 1L)))

    // emptied groups retract
    step(3, delete("153", "completely new text"),
      delete("203", "text c"), delete("105", "text d"))
    assert(sinkRows(sink).isEmpty)

    // replay idempotence
    val b3 = Seq(delete("153", "completely new text"),
      delete("203", "text c"), delete("105", "text d"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b3, Some(3L))
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))

    // mixed-width ids: 8 and 108 share a group (≡ mod 50) and the
    // survivor is the NUMERIC min 8 — a lexicographic min over the
    // string CDC key would elect "108" ("1" < "8"); r10 ADVICE
    step(4, create("8", "text w"), create("108", "text x"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) == Set(("8", 2L)))
  }
}
