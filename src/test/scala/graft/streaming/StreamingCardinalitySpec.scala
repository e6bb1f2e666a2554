package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Maintained HLL vocabulary sketches == a from-scratch sketch of every
  * row image ever applied (max-merge associativity), after every batch
  * and across a replayed batch. */
class StreamingCardinalitySpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def create(id: String, text: String): (String, String, Long) = {
    seqNo += 1
    ("documents",
      s"""{"before":null,"after":{"doc_id":"$id","text":"$text"},"op":"c","ts_ms":$seqNo}""",
      seqNo)
  }

  // english marker words make predLang deterministic ("the/a/of" → en)
  private def enText(words: String*) =
    ("the" +: "a" +: "of" +: words).mkString(" ")

  private def estimates(sink: InMemoryUpsertSink): Map[String, Long] =
    sink.docs("vocab_sketch").map { case (id, d) =>
      id -> d("distinct_tokens").asInstanceOf[Long]
    }.toMap

  test("maintained sketch equals from-scratch sketch of all applied images") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scard")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingCardinality.vocabSketch(spark, stateDir)))

    val applied = scala.collection.mutable.ArrayBuffer.empty[String]
    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      recs.foreach { r =>
        val text = r._2.split("\"text\":\"")(1).split("\"")(0)
        applied += text
      }
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))
      val expected = applied.toSeq.toDF("text")
        .select(graft.operators.TextAnalysis.predLang(col("text")).as("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy("lang")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("est"))
        .as[(String, Long)].collect().toMap
      assert(estimates(sink) == expected,
        s"batch $batchId: maintained != from-scratch sketch")
    }

    step(0, create("d1", enText("alpha", "beta")),
      create("d2", enText("beta", "gamma")))
    // small sets: the sparse-mode estimate is exact
    // {the a of alpha beta gamma}
    assert(estimates(sink)("en") == 6L)
    step(1, create("d3", enText("delta", "epsilon", "beta")))
    step(2, create("d4", enText("zeta")))
    // + {delta epsilon zeta}
    assert(estimates(sink)("en") == 9L)
  }

  test("replayed batch leaves every sketch estimate unchanged") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("scard-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingCardinality.vocabSketch(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", enText("one", "two")))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", enText("two", "three")))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = estimates(sink)
    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(estimates(sink) == after)
  }
}
