package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Curation

/** Incremental shared-chunk detection == batch q157 recompute at every
  * step of a replayed document changelog — shared windows appear when a
  * second carrier arrives, retract when an edit rewrites the window or
  * the carrier count falls back to one, and the whole thing replays
  * idempotently. */
class StreamingChunkDedupSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private def words(p: String, n: Int) = (0 until n).map(i => s"$p$i")
  private val common32 = words("s", 32)
  private val docA = (common32 ++ words("ta", 8)).mkString(" ")
  private val docB = (common32 ++ words("tb", 8)).mkString(" ")
  private val docC = words("c", 40).mkString(" ")
  private val docUnrelated = words("z", 40).mkString(" ")

  /** Batch q157 recompute over the current materialized document
    * state, via the SAME chunkHashes Column the view uses. */
  private def batchQ157(state: DataFrame): Map[String, (Long, Long, Long)] =
    state.select(col("doc_id"),
        explode(Curation.chunkHashes(col("text"))).as("h"))
      .groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min(col("doc_id").cast("long")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .as[(String, Long, Long, Long)].collect()
      .map { case (h, d, o, f) => h -> (d, o, f) }.toMap

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, (Long, Long, Long)] =
    sink.docs("chunk_dedup").map { case (id, d) =>
      id -> (d("n_docs").asInstanceOf[Long], d("n_occ").asInstanceOf[Long],
        d("first_doc").asInstanceOf[Long])
    }.toMap

  test("shared chunks == batch q157 after every batch; retraction on " +
      "edit and on carrier-count fall; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("schunk")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingChunkDedup.sharedChunkView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == batchQ157(pipeline.state("documents")),
        s"batch $batchId: incremental != batch q157 recompute")
    }

    // A and B share their first 32-token window; C is unrelated
    step(0, create("1", docA), create("2", docB), create("3", docC))
    val shared = sinkDocs(sink)
    assert(shared.size == 1, "exactly the common window is shared")
    assert(shared.values.head == ((2L, 2L, 1L)),
      "two carriers, two occurrences, earliest doc 1")

    // cross-batch carrier: a full copy of C arrives → C's window shared
    step(1, create("4", docC))
    assert(sinkDocs(sink).size == 2)

    // editing B away from the common prefix retracts the A∼B window
    step(2, update("2", docB, docUnrelated))
    assert(sinkDocs(sink).size == 1, "rewritten window must retract")

    // deleting the copy drops C's window back to one carrier
    step(3, delete("4", docC))
    assert(sinkDocs(sink).isEmpty)

    // replay the delete batch (crash-redelivery): no change
    step(3, delete("4", docC))
    assert(sinkDocs(sink).isEmpty)

    // a doc shrinking under 32 tokens owns no chunks (empty-list row)
    step(4, update("3", docC, "tiny doc"))
    assert(sinkDocs(sink).isEmpty)
  }
}
