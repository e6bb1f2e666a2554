package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Incremental exact-substring dedup == batch q59 recompute, at every
  * step of a replayed document changelog: after each micro-batch the
  * sink's (pair, shared_windows) set must equal a from-scratch 50-char-
  * window self-join over the CURRENT document state. */
class StreamingSubstringDedupSpec extends SparkSuite {
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
  private def create(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, oldT: String, newT: String): (String, String, Long) =
    rec(s"""{"before":${img(id, oldT)},"after":${img(id, newT)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":${img(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  // ~150-char texts; a one-word suffix change keeps a >100-char shared
  // prefix (many shared 50-char windows); disjoint vocabularies share none
  private def words(prefix: String) = (0 until 30).map(i => s"$prefix$i")
  private val textA = words("aa").mkString(" ")
  private val textA2 = (words("aa").dropRight(1) :+ "zz").mkString(" ")
  private val textC = words("cc").mkString(" ")
  private val textC2 = (words("cc").dropRight(1) :+ "yy").mkString(" ")
  private val textD = words("dd").mkString(" ")
  private val textE = words("ee").mkString(" ")

  /** Batch q59 recompute (string ids) over the current document state. */
  private def batchRecompute(state: DataFrame): Set[(String, String, Long)] = {
    val grams = state.select(col("doc_id"),
      explode(graft.functions.NGrams.charGrams(col("text"), 50)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("h"))
    grams.select(col("doc_id").as("doc_a"), col("h"))
      .join(grams.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_windows"))
      .as[(String, String, Long)].collect().toSet
  }

  private def sinkPairs(sink: InMemoryUpsertSink): Set[(String, String, Long)] =
    sink.docs("substring_dup_pairs").values.map { d =>
      (d("doc_a").toString, d("doc_b").toString,
        d("shared_windows").asInstanceOf[Long])
    }.toSet

  test("incremental pair set equals batch q59 recompute after every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssubdup")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSubstringDedup.substringDupView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      val expected = batchRecompute(pipeline.state("documents"))
      assert(sinkPairs(sink) == expected,
        s"batch $batchId: incremental != batch recompute")
    }

    // creates, incl. a same-batch duplicate pair (identical texts)
    step(0,
      create("d1", textA), create("d2", textA),
      create("d3", textC), create("d4", textD))
    assert(sinkPairs(sink).map(p => (p._1, p._2)) == Set(("d1", "d2")))

    // cross-batch discovery: new doc shares a long prefix with residents
    step(1, create("d5", textA2))
    assert(sinkPairs(sink).map(p => (p._1, p._2)) ==
      Set(("d1", "d2"), ("d1", "d5"), ("d2", "d5")))
    // the near-identical pair shares MORE windows than the prefix pair
    val byPair = sinkPairs(sink).map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair(("d1", "d2")) > byPair(("d1", "d5")))

    // update breaks pairs: d2 rewritten to unrelated text
    step(2, update("d2", textA, textE))
    assert(sinkPairs(sink).map(p => (p._1, p._2)) == Set(("d1", "d5")))

    // delete retracts; a same-batch create pairs with a resident doc
    step(3, delete("d5", textA2), create("d6", textC2))
    assert(sinkPairs(sink).map(p => (p._1, p._2)) == Set(("d3", "d6")))

    // update CREATES a pair: d4 rewritten into d1's near-dup
    step(4, update("d4", textD, textA2))
    assert(sinkPairs(sink).map(p => (p._1, p._2)) ==
      Set(("d1", "d4"), ("d3", "d6")))
  }

  test("replayed batch is idempotent (state merge skips, sink converges)") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssubdup-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSubstringDedup.substringDupView(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", textA), create("r2", textC))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r3", textA2), update("r2", textC, textC2))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkPairs(sink)
    assert(after.map(p => (p._1, p._2)) == Set(("r1", "r3")))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkPairs(sink) == after)
    assert(sinkPairs(sink) == batchRecompute(pipeline.state("documents")))
  }
}
