package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Incremental vocabulary-overlap matrix == batch q104 recompute at
  * every step of a replayed document changelog — including refcount
  * semantics (a token shared by two docs of one source survives one
  * doc's delete), private-token growth moving jaccard of pairs whose
  * intersection never changed, and a same-batch double flip. */
class StreamingVocabOverlapSpec extends SparkSuite {
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

  /** Batch q104 over the current state. */
  private def batchRecompute(state: DataFrame): Set[(String, String, Long, Double)] = {
    val st = state
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .distinct()
    val vs = st.groupBy("source").agg(count(lit(1)).as("nv"))
    val a = st.select(col("source").as("source_a"), col("tok"))
    val b = st.select(col("source").as("source_b"), col("tok"))
    a.join(b, Seq("tok")).filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
      .join(vs.select(col("source").as("source_a"), col("nv").as("na")), "source_a")
      .join(vs.select(col("source").as("source_b"), col("nv").as("nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        round(col("n_common") * 1.0 /
          (col("na") + col("nb") - col("n_common")), 6).as("jaccard"))
      .as[(String, String, Long, Double)].collect().toSet
  }

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, String, Long, Double)] =
    sink.docs("vocab_overlap").values.map { d =>
      (d("source_a").toString, d("source_b").toString,
        d("n_common").asInstanceOf[Long], d("jaccard").asInstanceOf[Double])
    }.toSet

  test("incremental overlap equals batch q104 recompute after every " +
      "batch — refcounts, private-token jaccard drift, double flips") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("svocab")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingVocabOverlap.vocabOverlapView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    // s0: two docs sharing "red"; s1 shares red+blue with s0
    step(0, create("d1", "red green", "s0"), create("d2", "red blue", "s0"),
      create("e1", "red blue yellow", "s1"))
    val p0 = sinkRows(sink)
    assert(p0.map(r => (r._1, r._2, r._3)) == Set(("s0", "s1", 2L)))

    // refcount: deleting ONE of the two red-holders must not shrink the
    // intersection (d2 still holds red+blue)
    step(1, delete("d1", "red green", "s0"))
    assert(sinkRows(sink).map(r => (r._1, r._2, r._3)) ==
      Set(("s0", "s1", 2L)))

    // private growth: s1 gains tokens s0 lacks — n_common fixed, jaccard
    // drops (the nv-dependency path, no pair delta at all)
    val j1 = sinkRows(sink).head._4
    step(2, create("e2", "purple orange", "s1"))
    val p2 = sinkRows(sink)
    assert(p2.map(r => (r._1, r._2, r._3)) == Set(("s0", "s1", 2L)))
    assert(p2.head._4 < j1)

    // double flip in one batch: a third source enters with "red" while
    // s0 loses it — token row transitions two sources at once
    step(3, create("f1", "red cyan", "s2"), delete("d2", "red blue", "s0"))
    val p3 = sinkRows(sink)
    // s0 now holds only {}: wait — d2 carried s0's whole vocab; s0 empty
    assert(!p3.exists(r => r._1 == "s0" || r._2 == "s0"))
    assert(p3.map(r => (r._1, r._2, r._3)) == Set(("s1", "s2", 1L)))

    // source rename via update: vocab moves wholesale between sources
    step(4, update("e2", "purple orange", "s1", "purple orange", "s2"))
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }

  test("replayed batch is idempotent (refcount/nv/pair merges skip, " +
      "sink converges)") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("svocab-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingVocabOverlap.vocabOverlapView(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", "ant bee cat", "s0"))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", "bee cat dog", "s1"),
      delete("r1", "ant bee cat", "s0"),
      create("r3", "ant bee", "s0"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after.map(r => (r._1, r._2, r._3)) == Set(("s0", "s1", 1L)))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }
}
