package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Incremental per-source cap == batch q109 recompute at every step of a
  * replayed document changelog — including the promotion case that
  * forces the full ledger (a delete of a KEPT doc promotes the doc just
  * below the cut, which top-k-only state could not produce) and a source
  * reassignment (both sources re-rank). */
class StreamingDomainCapSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType),
    StructField("source", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String, src: String) =
    s"""{"doc_id":"$id","text":"$text","source":"$src"}"""
  private def create(id: String, text: String, src: String) =
    rec(s"""{"before":null,"after":${img(id, text, src)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, oldT: String, oldS: String,
      newT: String, newS: String) =
    rec(s"""{"before":${img(id, oldT, oldS)},"after":${img(id, newT, newS)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String, src: String) =
    rec(s"""{"before":${img(id, text, src)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** quality rises with word count (< 100) and stopword density — m
    * "the x" pairs give monotonically distinct scores for m = 1..12. */
  private def text(m: Int): String =
    (0 until m).map(i => s"the w$i").mkString(" ")

  private def batchRecompute(state: DataFrame): Set[(String, String, Double, Long)] = {
    state.select(col("source"), col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("q").desc, col("doc_id"))))
      .filter(col("rk") <= 3)
      .select(col("source"), col("doc_id"), col("q"), col("rk").cast("long"))
      .as[(String, String, Double, Long)].collect().toSet
  }

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, String, Double, Long)] =
    sink.docs("domain_cap_view").values.map { d =>
      (d("source").toString, d("doc_id").toString,
        d("quality").asInstanceOf[Double], d("rk").asInstanceOf[Long])
    }.toSet

  test("incremental cap equals batch q109 recompute after every batch, " +
      "including below-cut promotion and source reassignment") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdomcap")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingDomainCap.domainCapView(spark, stateDir, capN = 3)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    // five docs in s0 (cap 3: two sit below the cut), one in s1
    step(0, create("d1", text(1), "s0"), create("d2", text(2), "s0"),
      create("d3", text(3), "s0"), create("d4", text(4), "s0"),
      create("d5", text(5), "s0"), create("e1", text(2), "s1"))
    val p0 = sinkRows(sink)
    assert(p0.count(_._1 == "s0") == 3)
    assert(p0.filter(_._1 == "s0").map(_._2) == Set("d5", "d4", "d3"))
    assert(p0.filter(_._1 == "s1").map(r => (r._2, r._4)) == Set(("e1", 1L)))

    // deleting the rank-1 doc promotes d2 from BELOW the cut — the
    // ledger-not-just-top-k case
    step(1, delete("d5", text(5), "s0"))
    assert(sinkRows(sink).filter(_._1 == "s0").map(_._2) ==
      Set("d4", "d3", "d2"))

    // quality update reorders within the cap
    step(2, update("d1", text(1), "s0", text(12), "s0"))
    assert(sinkRows(sink).filter(_._1 == "s0" )
      .find(_._4 == 1L).map(_._2).contains("d1"))

    // source reassignment: d1 leaves s0 (d2 re-enters) and outranks e1
    step(3, update("d1", text(12), "s0", text(12), "s1"))
    val p3 = sinkRows(sink)
    assert(p3.filter(_._1 == "s0").map(_._2) == Set("d4", "d3", "d2"))
    assert(p3.filter(_._1 == "s1").find(_._4 == 1L).map(_._2).contains("d1"))

    // a source draining below the cap deletes its trailing rank rows
    step(4, delete("d2", text(2), "s0"), delete("d3", text(3), "s0"))
    assert(sinkRows(sink).filter(_._1 == "s0").map(r => (r._2, r._4)) ==
      Set(("d4", 1L)))
  }

  test("replayed batch is idempotent (ledger merge skips, sink converges)") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdomcap-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingDomainCap.domainCapView(spark, stateDir, capN = 3)))

    pipeline.processBatch(Seq(create("r1", text(2), "s0"))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", text(4), "s0"), create("r3", text(6), "s0"),
      create("r4", text(8), "s0"), delete("r1", text(2), "s0"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after.map(_._2) == Set("r2", "r3", "r4"))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }
}
