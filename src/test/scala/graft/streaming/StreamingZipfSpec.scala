package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.TextAnalysis

/** Incremental Zipf fit == batch q108 recompute at every step of a
  * replayed document changelog — occurrence (not membership) counting,
  * language-pruned re-fits, a language draining away, and idempotent
  * replay of the running counters. */
class StreamingZipfSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType),
    StructField("lang", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String, lang: String) =
    s"""{"doc_id":"$id","text":"$text","lang":"$lang"}"""
  private def create(id: String, text: String, lang: String) =
    rec(s"""{"before":null,"after":${img(id, text, lang)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, oldT: String, oldL: String,
      newT: String, newL: String) =
    rec(s"""{"before":${img(id, oldT, oldL)},"after":${img(id, newT, newL)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String, lang: String) =
    rec(s"""{"before":${img(id, text, lang)},"op":"d","after":null,"ts_ms":$seqNo}""")

  private def batchRecompute(state: DataFrame): Set[(String, Long, Long, Double)] =
    TextAnalysis.zipfOf(state
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c")))
      .as[(String, Long, Long, Double)].collect().toSet

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, Long, Long, Double)] =
    sink.docs("zipf_fit").values.map { d =>
      (d("lang").toString, d("n_vocab").asInstanceOf[Long],
        d("n_top").asInstanceOf[Long], d("zipf_slope").asInstanceOf[Double])
    }.toSet

  test("incremental fit equals batch q108 recompute after every batch; " +
      "a drained language retracts") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("szipf")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingZipf.zipfView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    // a steep synthetic distribution in xx, a flat one in yy
    val steep = (1 to 20).flatMap(r =>
      Seq.fill(math.ceil(100.0 / r).toInt)(s"s$r")).mkString(" ")
    val flat = (1 to 20).map(r => s"f$r f$r f$r").mkString(" ")
    step(0, create("d1", steep, "xx"), create("e1", flat, "yy"))
    val p0 = sinkRows(sink)
    assert(p0.map(_._1) == Set("xx", "yy"))
    assert(p0.find(_._1 == "xx").get._4 < -0.5) // steep slope
    assert(math.abs(p0.find(_._1 == "yy").get._4) < 1e-6) // flat corpus

    // occurrence counting: a second doc repeating head tokens reshapes
    // only xx's curve (yy untouched — language-pruned re-fit)
    step(1, create("d2", (1 to 5).map(r => s"s$r").mkString(" "), "xx"))

    // update moves a doc between languages: both re-fit
    step(2, update("d2", (1 to 5).map(r => s"s$r").mkString(" "), "xx",
      (1 to 5).map(r => s"f$r").mkString(" "), "yy"))

    // a language draining away retracts its sink row
    step(3, delete("e1", flat, "yy"),
      delete("d2", (1 to 5).map(r => s"f$r").mkString(" "), "yy"))
    assert(sinkRows(sink).map(_._1) == Set("xx"))
  }

  test("replayed batch is idempotent despite occurrence counters") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("szipf-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingZipf.zipfView(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", "a a a b b c", "xx"))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", "a b c d", "xx"),
      delete("r1", "a a a b b c", "xx"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(after == batchRecompute(pipeline.state("documents")))
  }
}
