package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.TextAnalysis

/** Streaming calibration == batch q152's bin arithmetic over the
  * current state at every step of a replayed changelog — the frozen
  * scorer's reliability diagram maintained with full retraction. The
  * reference recompute applies q152's grouping (floor of the score in
  * logit space, count + positive count + rate) to the live docs scored
  * by the SAME frozen expression, computed in plain Scala. */
class StreamingCalibrationSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String) =
    s"""{"doc_id":"$id","text":"$text"}"""
  private def create(id: String, text: String) =
    rec(s"""{"before":null,"after":${img(id, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, o: String, n: String) =
    rec(s"""{"before":${img(id, o)},"after":${img(id, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String) =
    rec(s"""{"before":${img(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // frozen weights spreading scores across several unit bins
  private val weights: Map[Long, Double] =
    (0L until 1024L).map(b => b -> r6((b % 11 - 5) * 0.35)).toMap

  /** q152's bin arithmetic over the live state, via the view's own
    * frozen score/label expressions (the arithmetic under test is the
    * binning + counting + retraction, recomputed batch-style). */
  private def batchRecompute(
      state: DataFrame): Map[Long, (Long, Long, Double)] =
    state
      .select(
        floor(StreamingAucMonitor.scoreExpr(col("text"), weights))
          .cast("long").as("bin"),
        (TextAnalysis.qualityScore(col("text")) >= 0.5).as("hi"))
      .as[(Long, Boolean)].collect()
      .groupBy(_._1).map { case (bin, rows) =>
        val n = rows.length.toLong
        val pos = rows.count(_._2).toLong
        bin -> ((n, pos, r6(pos.toDouble / n)))
      }

  private def sinkRows(
      sink: InMemoryUpsertSink): Map[Long, (Long, Long, Double)] =
    sink.docs("calibration").values.map { d =>
      d("logit_bin").asInstanceOf[Long] ->
        ((d("n").asInstanceOf[Long], d("n_pos").asInstanceOf[Long],
          d("pos_rate").asInstanceOf[Double]))
    }.toMap

  private def hiQ(prefix: String, n: Int = 47): String =
    (Seq("the", "a", "of") ++ (0 until n).map(i => s"$prefix$i")).mkString(" ")
  private def loQ(prefix: String, n: Int = 50): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("calibration == batch q152 recompute at every batch: bins fill, " +
      "updates move docs between bins, deletes retract, empty bins leave") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scalib")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingCalibration.calibrationView(spark, stateDir, weights)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: sink != batch q152 recompute")
    }

    // both label classes across several score bins
    step(0, create("h1", hiQ("aa")), create("h2", hiQ("bb")),
      create("l1", loQ("cc")), create("l2", loQ("dd")))
    val bins0 = sinkRows(sink)
    assert(bins0.nonEmpty)
    assert(bins0.values.map(_._1).sum == 4L)
    assert(bins0.values.map(_._2).sum == 2L, "two positives")
    bins0.values.foreach { case (n, pos, rate) =>
      assert(rate == r6(pos.toDouble / n))
    }

    // a text edit moves a doc's score bin AND flips its label
    step(1, update("h2", hiQ("bb"), loQ("ee")))
    assert(sinkRows(sink).values.map(_._2).sum == 1L)

    // deletes retract; a bin reaching n = 0 leaves the sink
    step(2, delete("l1", loQ("cc")), delete("l2", loQ("dd")),
      delete("h2", loQ("ee")))
    assert(sinkRows(sink).values.map(_._1).sum == 1L)

    step(3, delete("h1", hiQ("aa")))
    assert(sinkRows(sink).isEmpty, "drained corpus must empty the sink")
  }

  test("replayed batch is idempotent for the bin counters") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scalib-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingCalibration.calibrationView(spark, stateDir, weights)))

    pipeline.processBatch(Seq(create("h1", hiQ("aa")),
      create("l1", loQ("cc"))).toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("h2", hiQ("bb")),
      update("l1", loQ("cc"), loQ("dd")))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after == batchRecompute(pipeline.state("documents")))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
  }
}
