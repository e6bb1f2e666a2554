package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Curation

/** Maintained α-mixture table == batch q132 arithmetic over the live
  * corpus after every batch (same [[Curation.alphaMix]] fold both
  * sides): one source's delta re-weights every row, empty sources
  * retract, replay is idempotent. */
class StreamingMixSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("source", StringType),
    StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, src: String, text: String) =
    s"""{"doc_id":"$id","source":"$src","text":"$text"}"""
  private def create(id: String, src: String, text: String) =
    rec(s"""{"before":null,"after":${img(id, src, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, src: String, o: String, n: String) =
    rec(s"""{"before":${img(id, src, o)},"after":${img(id, src, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, src: String, text: String) =
    rec(s"""{"before":${img(id, src, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def words(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] = {
    if (state.isEmpty) return Map.empty
    Curation.alphaMix(
        state.toDF("source", "text").groupBy("source")
          .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))
            .as("n_tokens")))
      .collect().map(r => r.getString(0) ->
        Seq(r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"),
          r.getAs[Double]("epochs"))).toMap
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] =
    sink.docs("temperature_mix").map { case (id, d) =>
      id -> Seq(d("n_tokens"), d("weight"), d("epochs"))
    }.toMap

  test("mixture equals batch recompute after every batch; one source's " +
      "change re-weights all; empty source retracts; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("smix")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingMix.mixView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    step(0, create("1", "web", words(100)), create("2", "web", words(44)),
      create("3", "book", words(9)))
    val s0 = Seq("web" -> words(100), "web" -> words(44), "book" -> words(9))
    assert(sinkDocs(sink) == expected(s0))
    // α=0.5 flattening: book (9 tokens) gets more epochs than web (144)
    assert(sinkDocs(sink)("book")(2).asInstanceOf[Double] >
      sinkDocs(sink)("web")(2).asInstanceOf[Double])

    // growing book re-weights web too, without touching web's state
    step(1, update("3", "book", words(9), words(400)))
    val s1 = Seq("web" -> words(100), "web" -> words(44),
      "book" -> words(400))
    assert(sinkDocs(sink) == expected(s1))

    // replay converges
    step(1, update("3", "book", words(9), words(400)))
    assert(sinkDocs(sink) == expected(s1))

    // book leaves: its row retracts, web re-weights to 1.0
    step(2, delete("3", "book", words(400)))
    assert(sinkDocs(sink) == expected(
      Seq("web" -> words(100), "web" -> words(44))))
    assert(!sinkDocs(sink).contains("book"))
    assert(sinkDocs(sink)("web")(1) == 1.0)
  }
}
