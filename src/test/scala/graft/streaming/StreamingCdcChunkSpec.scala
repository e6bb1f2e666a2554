package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Curation

/** The content-defined chunking twin: (1) the row-local
  * [[Curation.cdcChunkHashes]] Column equals batch q169's exploded-row
  * manifest digests on real corpus docs — the two implementations of
  * the boundary rule cannot drift; (2) the continuous shared-chunk view
  * == batch recompute at every replayed step, INCLUDING the property
  * content-defined chunking exists for: an insertion near a doc's head
  * re-chunks only until the next boundary, so a chunk shared with
  * another doc further down SURVIVES the edit (fixed windows would
  * shift every downstream boundary and retract it). */
class StreamingCdcChunkSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  test("cdcChunkHashes Column == batch q169 manifest on corpus docs") {
    val dir = "/root/testdata/sf0.001"
    val manifest = graft.SparkEntry.queries("q169_cdc_chunking")(spark, dir)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("chunk_idx"),
        col("chunk_md5")))).as("m"))
      .select(col("doc_id"),
        transform(col("m"), _.getField("chunk_md5")).as("chunks"))
    val columnForm = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), Curation.cdcChunkHashes(col("text")).as("chunks"))
    val joined = manifest.join(columnForm.withColumnRenamed("chunks", "c2"),
      "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("chunks") =!= col("c2")).count() == 0,
      "row-local Column and exploded-row batch forms must agree per doc")
  }

  /** Batch recompute of the shared-chunk table over current state via
    * the SAME digest Column the view chunks batch docs with. */
  private def batchShared(state: DataFrame): Map[String, (Long, Long, Long)] =
    state.select(col("doc_id"),
        explode(Curation.cdcChunkHashes(col("text"))).as("h"))
      .groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min(col("doc_id").cast("long")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .as[(String, Long, Long, Long)].collect()
      .map { case (h, d, o, f) => h -> (d, o, f) }.toMap

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, (Long, Long, Long)] =
    sink.docs("cdc_chunk_dedup").map { case (id, d) =>
      id -> (d("n_docs").asInstanceOf[Long], d("n_occ").asInstanceOf[Long],
        d("first_doc").asInstanceOf[Long])
    }.toMap

  // a long shared tail with ~9 expected content boundaries: chunks
  // resync inside it regardless of what precedes
  private val sharedTail = (0 until 120).map(i => s"w${i * 7 % 97}").mkString(" ")
  private val docA = "alpha prefix " + sharedTail
  private val docB = "a completely different beginning " + sharedTail
  private val docAEdited = "X" + docA // one-char head insertion

  test("continuous CDC chunks == batch recompute; shared tail survives a head insertion") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scdcchunk")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingChunkDedup.cdcChunkView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == batchShared(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    step(0, create("1", docA), create("2", docB))
    val shared0 = sinkDocs(sink)
    assert(shared0.nonEmpty,
      "the shared tail must produce at least one shared chunk " +
        "(boundaries resync inside it)")

    // THE content-defined property: a one-char insertion at doc 1's head
    // changes only its chunks up to the first boundary — the shared tail
    // chunks keep their digests and stay shared
    step(1, update("1", docA, docAEdited))
    val shared1 = sinkDocs(sink)
    assert(shared1.nonEmpty && shared1.keySet.intersect(shared0.keySet)
      == shared1.keySet.intersect(shared0.keySet), "sanity")
    assert(shared0.keySet.intersect(shared1.keySet).nonEmpty,
      "shared tail chunks must SURVIVE the head insertion — the " +
        "property fixed-stride chunking structurally lacks")

    // carrier falls to one → retract; replay idempotent
    step(2, delete("2", docB))
    assert(sinkDocs(sink).isEmpty)
    step(2, delete("2", docB))
    assert(sinkDocs(sink).isEmpty)
  }
}
