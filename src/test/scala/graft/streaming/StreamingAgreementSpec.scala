package graft.streaming

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Governance

/** Streaming inter-gate agreement == batch q168 arithmetic over the
  * current document state at every replayed step: confusion cells
  * maintained ±, κ priced at read via the shared kappaFromCells, a doc
  * edit FLIPPING a gate verdict (cell-to-cell move), a cell emptying
  * out of the sink, replay idempotent. */
class StreamingAgreementSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType), StructField("n_chars", LongType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: Long, src: String, text: String) =
    s"""{"doc_id":$id,"source":"$src","text":"$text","n_chars":${text.length}}"""
  private def create(id: Long, src: String, text: String) =
    rec(s"""{"before":null,"after":${img(id, src, text)},"op":"c","ts_ms":$seqNo}""")
  private def edit(id: Long, src: String, o: String, n: String) =
    rec(s"""{"before":${img(id, src, o)},"after":${img(id, src, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: Long, src: String, text: String) =
    rec(s"""{"before":${img(id, src, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  // rater A: n_chars >= 200; rater B: >= 40 tokens
  private def txt(words: Int, wordLen: Int): String =
    (0 until words).map(i => ("x" * (wordLen - 1)) + (i % 10)).mkString(" ")
  private val bothPass = txt(50, 6)    // 349 chars, 50 tokens → (1,1)
  private val neither = txt(10, 4)     // 49 chars, 10 tokens  → (0,0)
  private val onlyB = txt(42, 3)       // 167 chars, 42 tokens → (0,1)
  private val onlyA = txt(30, 8)       // long words, few tokens

  private def readKappa(sink: InMemoryUpsertSink): Set[Seq[Any]] = {
    val docs = sink.docs("gate_agreement").values.toSeq
    if (docs.isEmpty) return Set.empty
    val cells = docs.map(d => (d("source").toString, d("a").toString,
      d("b").toString, d("c").asInstanceOf[Long]))
      .toDF("source", "a", "b", "c")
    StreamingAgreement.kappa(cells).collect().map(_.toSeq).toSet
  }

  private def batchKappa(state: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
    import org.apache.spark.sql.functions._
    val cells = state
      .select(col("source"), Governance.raterA.as("a"),
        Governance.raterB.as("b"))
      .groupBy("source", "a", "b").agg(count(lit(1)).as("c"))
    Governance.kappaFromCells(cells).collect().map(_.toSeq).toSet
  }

  test("incremental confusion cells + read-time kappa == batch q168 arithmetic") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sagree")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAgreement.confusionCells(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))
      assert(readKappa(sink) == batchKappa(pipeline.state("documents")),
        s"batch $batchId")
    }

    // verify the fixture hits distinct cells (guards against silent
    // rater drift making the test vacuous)
    assert(bothPass.length >= 200 && neither.length < 200)
    assert(onlyB.length < 200 && onlyB.split("\\s+").length >= 40)
    assert(onlyA.length >= 200 && onlyA.split("\\s+").length < 40)

    step(0, create(1, "web", bothPass), create(2, "web", neither),
      create(3, "web", onlyB), create(4, "book", onlyA),
      create(5, "book", bothPass))

    // an edit flips doc 3's rater-B verdict: (0,1) cell empties, (0,0)
    // gains — κ re-prices on the same batch
    step(1, edit(3, "web", onlyB, neither))

    // deleting the last (1,1) doc of 'book' empties that cell
    step(2, delete(5, "book", bothPass))

    // replay idempotence
    pipeline.processBatch(
      Seq(delete(5, "book", bothPass)).toDF("table", "value", "seq"),
      Some(2L))
    assert(readKappa(sink) == batchKappa(pipeline.state("documents")))
  }
}
