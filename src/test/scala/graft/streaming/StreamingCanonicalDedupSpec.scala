package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental canonical-form dedup == batch q137 recompute at every
  * step of a replayed changelog: case/whitespace/NFC variants share a
  * group (where raw exact dedup would not), a canonicalization-only
  * edit does NOT move a doc between groups, a real edit does, and
  * n_raw_variants tracks the distinct RAW texts inside each group. */
class StreamingCanonicalDedupSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  /** Batch q137's aggregation over the materialized state — the same
    * [[graft.operators.Dedup.canonicalText]] column. */
  private def batchRecompute(
      state: DataFrame): Set[(String, String, Long, Long)] =
    state.groupBy(
        md5(graft.operators.Dedup.canonicalText(col("text"))).as("canon_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
        countDistinct("text").as("n_raw_variants"))
      .as[(String, String, Long, Long)].collect().toSet

  private def sinkRows(
      sink: InMemoryUpsertSink): Set[(String, String, Long, Long)] =
    sink.docs("canonical_dedup").values.map { d =>
      (d("canon_hash").toString, d("keep_id").toString,
        d("n_copies").asInstanceOf[Long],
        d("n_raw_variants").asInstanceOf[Long])
    }.toSet

  test("canonical groups == batch q137 recompute; variants group, " +
      "canonical-only edits stay, real edits move") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scanon")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingExactDedup.canonicalDedupView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    // NFC, NFD and case/whitespace renderings of one sentence, plus a
    // genuinely different doc — one 3-member group (3 raw variants) and
    // one singleton
    step(0,
      create("a1", "Caf\u00e9 au lait"),  // NFC: precomposed e-acute
      create("a2", "Cafe\u0301 au lait"), // NFD: e + combining acute
      create("a3", "  caf\u00e9   AU  lait "),
      create("b1", "other text"))
    assert(sinkRows(sink).map(r => (r._2, r._3, r._4)) ==
      Set(("a1", 3L, 3L), ("b1", 1L, 1L)))

    // a canonicalization-invisible edit (case flip to an NFC caps
    // rendering) keeps the doc in its group
    step(1, update("a2", "Cafe\u0301 au lait", "CAF\u00c9 AU LAIT"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("a1", 3L), ("b1", 1L)))

    // a REAL edit moves a2 out: old group shrinks, new group appears
    step(2, update("a2", "CAF\u00c9 AU LAIT", "totally new content"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("a1", 2L), ("a2", 1L), ("b1", 1L)))

    // deleting the survivor hands keep_id to a3
    step(3, delete("a1", "Caf\u00e9 au lait"))
    assert(sinkRows(sink).map(r => (r._2, r._3)) ==
      Set(("a3", 1L), ("a2", 1L), ("b1", 1L)))

    // emptied groups retract
    step(4, delete("a3", "  caf\u00e9   AU  lait "),
      delete("a2", "totally new content"), delete("b1", "other text"))
    assert(sinkRows(sink).isEmpty)
  }

  test("replayed batch is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scanon-replay")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingExactDedup.canonicalDedupView(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", "Dup  Body"))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", "dup body"), create("r3", "solo"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after.map(r => (r._2, r._3, r._4)) ==
      Set(("r1", 2L, 2L), ("r3", 1L, 1L)))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }
}
