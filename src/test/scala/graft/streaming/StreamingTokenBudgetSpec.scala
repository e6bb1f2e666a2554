package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.{Provenance, TextAnalysis}

/** Streaming token-budget selection == batch q150 recompute at every
  * step of a replayed document changelog. Both sides run the SAME
  * [[Provenance.budgetReport]] over the same (domain, bucket) counts,
  * so the pin here is the counter-state plumbing: quality edits move a
  * doc between buckets and re-thresh its domain only, deletes shrink
  * the right bucket, an emptied domain retracts its row, and replay is
  * idempotent. Budget = 10 tokens so the admission boundary is live in
  * a unit-sized corpus. */
class StreamingTokenBudgetSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private val budget = 10L

  private def expected(state: Seq[(String, String)])
      : Map[String, (Long, Long, Option[Int], Long, Long)] =
    if (state.isEmpty) Map.empty
    else Provenance.budgetReport(
        state.toDF("doc_id", "text")
          .select(
            Provenance.registeredDomain(col("doc_id").cast("long"))
              .as("rd"),
            floor(TextAnalysis.qualityScore(col("text")) * 100)
              .cast("int").as("qb"),
            size(split(trim(col("text")), "\\s+")).cast("long")
              .as("n_tok"))
          .filter(col("rd").isNotNull)
          .groupBy("rd", "qb")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens")),
        budget)
      .as[(String, Long, Long, Option[Int], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  private def sinkDocs(sink: InMemoryUpsertSink)
      : Map[String, (Long, Long, Option[Int], Long, Long)] =
    sink.docs("token_budget").map { case (id, d) =>
      id -> ((d("n_docs").asInstanceOf[Long],
        d("n_tokens").asInstanceOf[Long],
        Option(d("threshold_qb")).map(_.asInstanceOf[Int]),
        d("n_docs_kept").asInstanceOf[Long],
        d("n_tokens_kept").asInstanceOf[Long]))
    }.toMap

  test("selection == batch recompute; quality edits re-bucket, the " +
      "budget cuts the worse bucket, emptied domains retract, replay " +
      "idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sbudget")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingTokenBudget.budgetView(spark, stateDir,
        budget = budget)))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch q150 recompute")
    }

    // ids 24 and 84 share registered domain site4.com (both ≡ 24 mod
    // 60); 25 is site5.org. The stop-word-heavy text lands in a higher
    // quality bucket than the stop-free one; each is 6 tokens, so with
    // budget 10 the better bucket fits and adding the worse one busts
    val good = "the a of the a of"
    val bad = "xx yy zz ww vv uu"
    state = Map("24" -> good, "84" -> bad, "25" -> bad)
    step(0, create("24", good), create("84", bad), create("25", bad))
    val dom = sinkDocs(sink)("site4.com")
    assert(dom._1 == 2L && dom._4 == 1L,
      s"budget must cut the worse bucket: $dom")
    assert(dom._5 <= budget)
    assert(sinkDocs(sink)("site5.org")._4 == 1L) // fits whole

    // a quality edit moves 84 into the good bucket: both docs now share
    // one 12-token bucket, which alone busts the budget -> nothing kept
    state += ("84" -> good)
    step(1, update("84", bad, good))
    val dom2 = sinkDocs(sink)("site4.com")
    assert(dom2._4 == 0L && dom2._3.isEmpty,
      s"an over-budget best bucket keeps nothing: $dom2")

    // deleting one of the pair fits the survivor again
    state -= "24"
    step(2, delete("24", good))
    assert(sinkDocs(sink)("site4.com")._4 == 1L)

    // emptied domain retracts
    state -= "84"
    step(3, delete("84", good))
    assert(!sinkDocs(sink).contains("site4.com"))

    // replay idempotence
    pipeline.processBatch(Seq(delete("84", good))
      .toDF("table", "value", "seq"), Some(3L))
    assert(sinkDocs(sink) == expected(state.toSeq))
  }
}
