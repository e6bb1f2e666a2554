package graft.streaming

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Maintained novelty == a from-scratch batch-q103 recompute over the
  * corpus's CURRENT images after every batch — including the two credit
  * hand-offs that force resident re-scores: a smaller-keyed newcomer
  * STRIPPING a resident's novelty, and a first-holder delete HANDING
  * credit to the next resident. Replay is a no-op. */
class StreamingNoveltySpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(op: String, id: String, text: String) = {
    seqNo += 1
    val after =
      if (op == "d") "null"
      else s"""{"doc_id":"$id","text":"$text"}"""
    val before =
      if (op == "c") "null"
      else s"""{"doc_id":"$id","text":"-"}"""
    ("documents",
      s"""{"before":$before,"after":$after,"op":"$op","ts_ms":$seqNo}""",
      seqNo)
  }

  // in-memory replica of batch q103 over current images, string-key order
  private def shingles(text: String): Set[String] = {
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (w.length < 5) Set.empty else w.sliding(5).map(_.mkString(" ")).toSet
  }
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def expectedOf(current: Map[String, String])
      : Map[String, (Long, Long, Double)] = {
    val gsets = current.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val first = gsets.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    gsets.map { case (id, gs) =>
      val novel = gs.count(g => first(g) == id).toLong
      id -> ((gs.size.toLong, novel, r6(novel.toDouble / gs.size)))
    }
  }
  private def sinkState(sink: InMemoryUpsertSink)
      : Map[String, (Long, Long, Double)] =
    sink.docs("novelty").map { case (id, d) =>
      id -> ((d("n_grams").asInstanceOf[Long],
        d("n_novel").asInstanceOf[Long],
        d("novel_frac").asInstanceOf[Double]))
    }.toMap

  test("novelty tracks credit hand-offs through create/update/delete") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("snov")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingNovelty.noveltyView(spark, stateDir)))

    val current = scala.collection.mutable.Map.empty[String, String]
    var batchNo = 0L
    def step(recs: ((String, String, Long), (String, String))*): Unit = {
      recs.foreach { case (_, (id, text)) =>
        if (text == null) current.remove(id) else current(id) = text
      }
      pipeline.processBatch(
        recs.map(_._1).toDF("table", "value", "seq"), Some(batchNo))
      batchNo += 1
      assert(sinkState(sink) == expectedOf(current.toMap),
        s"batch ${batchNo - 1}: sink != batch recompute")
    }
    def c(id: String, text: String) = (rec("c", id, text), (id, text))
    def u(id: String, text: String) = (rec("u", id, text), (id, text))
    def d(id: String) = (rec("d", id, null), (id, null: String))

    val textA = "a b c d e f"    // grams: "a b c d e", "b c d e f"
    step(c("d5", textA))         // sole doc: fully novel
    step(c("d7", textA))         // dup, larger key: d7 scores 0, d5 keeps 1.0
    assert(sinkState(sink)("d7")._3 == 0.0 && sinkState(sink)("d5")._3 == 1.0)
    // smaller-keyed newcomer STRIPS the untouched resident's credit
    step(c("d1", textA))
    assert(sinkState(sink)("d5")._3 == 0.0)
    // partial overlap: one shared gram, one novel
    step(c("d9", "a b c d e zz"))
    assert(sinkState(sink)("d9") == ((2L, 1L, 0.5)))
    // short doc: no grams, absent from the sink
    step(c("d0", "too few words"))
    assert(!sinkState(sink).contains("d0"))
    // deleting the first holder HANDS credit back to the next resident
    step(d("d1"))
    assert(sinkState(sink)("d5")._3 == 1.0)
    // re-text moves d5's grams away; d7 becomes textA's first holder
    step(u("d5", "x y z w v u"))
    assert(sinkState(sink)("d7")._3 == 1.0 && sinkState(sink)("d5")._3 == 1.0)
    // drain to empty
    step(d("d5"), d("d7"), d("d9"), d("d0"))
    assert(sinkState(sink).isEmpty)
  }

  test("replayed batch leaves sink and state unchanged") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("snov-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingNovelty.noveltyView(spark, stateDir)))

    pipeline.processBatch(
      Seq(rec("c", "r1", "one two three four five six"))
        .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(rec("c", "r0", "one two three four five"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkState(sink)
    assert(after("r0")._3 == 1.0 && after("r1")._2 == 1L,
      "r0 claims the shared gram; r1 keeps only its own tail gram")
    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(sinkState(sink) == after)
  }
}
