package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.TextAnalysis

/** Streaming AUC monitor == brute-force pair-counting AUC over the
  * current state at every step of a replayed changelog — the frozen
  * scorer's quality tracked with full retraction. The reference is the
  * DEFINITION (P(pos > neg) + ties/2 over all pairs), independent of
  * the engine's mid-rank identity. */
class StreamingAucMonitorSpec extends SparkSuite {
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

  // frozen weights: positive log-odds on a few buckets — which buckets
  // a text hits is irrelevant to the CONTRACT (score + label are reused
  // verbatim from the view's own expressions; the AUC arithmetic is
  // what this spec verifies independently)
  private val weights: Map[Long, Double] =
    (0L until 1024L).map(b => b -> r6((b % 7 - 3) * 0.1)).toMap

  /** Brute-force AUC over the state, by the definition. */
  private def bruteForce(state: DataFrame)
      : Option[(Long, Long, Option[Double])] = {
    val rows = state
      .select(StreamingAucMonitor.scoreExpr(col("text"), weights).as("s"),
        (TextAnalysis.qualityScore(col("text")) >= 0.5).as("hi"))
      .as[(Double, Boolean)].collect()
    if (rows.isEmpty) None
    else {
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val auc =
        if (pos.isEmpty || neg.isEmpty) None
        else Some(r6((for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum /
          (pos.length.toDouble * neg.length)))
      Some((pos.length.toLong, neg.length.toLong, auc))
    }
  }

  private def sinkRow(sink: InMemoryUpsertSink)
      : Option[(Long, Long, Option[Double])] =
    sink.docs("auc_monitor").get("auc").map { d =>
      (d("n_pos").asInstanceOf[Long], d("n_neg").asInstanceOf[Long],
        Option(d("auc")).map(_.asInstanceOf[Double]))
    }

  // texts spanning both label classes: hiQ has stopwords (quality ≥ .5),
  // loQ has none
  private def hiQ(prefix: String, n: Int = 47): String =
    (Seq("the", "a", "of") ++ (0 until n).map(i => s"$prefix$i")).mkString(" ")
  private def loQ(prefix: String, n: Int = 50): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("incremental AUC equals brute-force pair counting at every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("saucmon")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAucMonitor.aucView(spark, stateDir, weights)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRow(sink) == bruteForce(pipeline.state("documents")),
        s"batch $batchId: ${sinkRow(sink)} != brute force")
    }

    // one class only → AUC NULL but counts live
    step(0, create("h1", hiQ("aa")), create("h2", hiQ("bb")))
    assert(sinkRow(sink).get._3.isEmpty)

    // second class arrives → AUC defined
    step(1, create("l1", loQ("cc")), create("l2", loQ("dd")))
    assert(sinkRow(sink).get._3.isDefined)

    // an update flips a doc's label and moves its score cell
    step(2, update("h2", hiQ("bb"), loQ("bb")))
    assert(sinkRow(sink).get == (1L, 3L,
      bruteForce(pipeline.state("documents")).get._3))

    // deletes retract: removing the last positive undefines AUC again
    step(3, delete("h1", hiQ("aa")))
    assert(sinkRow(sink).get._3.isEmpty)

    // drain to empty retracts the row entirely
    step(4, delete("l1", loQ("cc")), delete("l2", loQ("dd")),
      delete("h2", loQ("bb")))
    assert(sinkRow(sink).isEmpty)
  }

  test("replayed batch is idempotent for the ± score counters") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("saucmon-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAucMonitor.aucView(spark, stateDir, weights)))

    pipeline.processBatch(Seq(create("h1", hiQ("aa")),
      create("l1", loQ("cc"))).toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("h2", hiQ("bb")),
      update("l1", loQ("cc"), loQ("dd")))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRow(sink)
    assert(after == bruteForce(pipeline.state("documents")))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRow(sink) == after)
  }
}
