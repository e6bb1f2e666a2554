package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.{SparkSuite, TableSpec}

/** Property form of the streaming-view contracts: for RANDOM document
  * changelogs split into random micro-batches, the decontamination and
  * BM25 sinks must equal their PRODUCTION batch queries (q26 / q60)
  * over the current materialized state after EVERY batch — not just at
  * the end, because the interesting events (a gram's last holdout
  * holder leaving, df/avgdl drift) happen mid-stream. Texts draw from a
  * small shared word pool so 5-gram overlaps, vocab-term frequencies,
  * and content-hash split moves all occur by construction. */
class StreamingViewPropertySpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private val pool = Vector("data", "vector", "window", "alpha", "beta",
    "gamma", "delta", "epsilon", "filler", "plain")

  private case class Op(op: String, id: String, text: String)

  private val genOp: Gen[Op] = for {
    op <- Gen.frequency(4 -> "c", 3 -> "u", 2 -> "d")
    id <- Gen.oneOf("d1", "d2", "d3", "d4", "d5", "d6")
    n <- Gen.choose(5, 10)
    ws <- Gen.listOfN(n, Gen.oneOf(pool))
  } yield Op(op, id, ws.mkString(" "))

  private def envelope(o: Op, seq: Long): (String, String, Long) = {
    val img = s"""{"doc_id":"${o.id}","text":"${o.text}"}"""
    // pre-images come from materialized state, not the envelope, so the
    // before field only needs to be non-null for u/d (same as the
    // pipeline property spec)
    val b = if (o.op == "c") "null" else img
    val a = if (o.op == "d") "null" else img
    ("documents", s"""{"before":$b,"after":$a,"op":"${o.op}","ts_ms":$seq}""",
      seq)
  }

  private def batchQuery(pipeline: CdcPipeline, q: String): Map[String, Any] = {
    val dir = tmpDir("svp-batch")
    pipeline.state("documents").select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries(q)(spark, dir)
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
  }

  test("random changelogs: decontamination and BM25 sinks == batch q26/q60 per batch") {
    var seed = Seed(11L)
    (1 to 3).foreach { trial =>
      val ops = Gen.nonEmptyListOf(genOp)
        .pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      val sink = new InMemoryUpsertSink
      val stateDir = tmpDir(s"svp-$trial")
      val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
        Seq(StreamingDecontamination.decontaminationView(spark, stateDir),
          StreamingBm25.indexView(spark, stateDir)))

      val records = ops.zipWithIndex.map { case (o, i) => envelope(o, i.toLong) }
      val batches = records.grouped(math.max(records.size / 3, 1)).toSeq
      batches.zipWithIndex.foreach { case (b, i) =>
        pipeline.processBatch(b.toDF("table", "value", "seq"), Some(i.toLong))

        val gotDeco = sink.docs("decontamination")
          .map { case (k, d) => k -> d("n_shared_grams") }
        assert(gotDeco == batchQuery(pipeline, "q26_decontaminate"),
          s"decontamination trial $trial batch $i ops=$ops")

        val gotBm25 = StreamingBm25.search(spark, stateDir)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val wantBm25 = batchQuery(pipeline, "q60_bm25")
          .map { case (k, v) => k -> v.asInstanceOf[Double] }
        assert(gotBm25.keySet == wantBm25.keySet,
          s"bm25 docs trial $trial batch $i ops=$ops")
        for ((d, s) <- wantBm25)
          assert(math.abs(gotBm25(d) - s) <= 1e-6,
            s"bm25 trial $trial batch $i doc $d: ${gotBm25(d)} vs $s")
      }
    }
  }
}
