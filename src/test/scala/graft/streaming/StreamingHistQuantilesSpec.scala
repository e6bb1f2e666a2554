package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.TextAnalysis

/** Maintained histogram quantiles == batch histogram recompute over the
  * live corpus after every batch of a replayed changelog (same
  * [[TextAnalysis.quantilesFromCounts]] fold both sides), with source
  * retraction and idempotent replay. */
class StreamingHistQuantilesSpec extends SparkSuite {
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

  private def txt(len: Int): String = "x" * len

  private def expected(state: Seq[(String, String)]): Map[String, Seq[Any]] = {
    if (state.isEmpty) return Map.empty
    TextAnalysis.quantilesFromCounts(
        state.toDF("source", "text")
          .groupBy(col("source"),
            (length(col("text")).cast("long") / 64).cast("long").as("k"))
          .agg(count(lit(1)).as("c")),
        col("k") * 64)
      .collect().map(r => r.getString(0) ->
        Seq(r.getAs[Long]("n"), r.getAs[Long]("p50"),
          r.getAs[Long]("p90"), r.getAs[Long]("p99"))).toMap
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, Seq[Any]] =
    sink.docs("hist_quantiles").map { case (id, d) =>
      id -> Seq(d("n"), d("p50_est"), d("p90_est"), d("p99_est"))
    }.toMap

  test("quantiles equal batch histogram recompute after every batch; " +
      "sources retract; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("shq")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingHistQuantiles.histView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    step(0, create("1", "web", txt(100)), create("2", "web", txt(300)),
      create("3", "web", txt(900)), create("4", "book", txt(5000)))
    val s0 = Seq("web" -> txt(100), "web" -> txt(300), "web" -> txt(900),
      "book" -> txt(5000))
    assert(sinkDocs(sink) == expected(s0))

    // a length-changing update moves web's p90 bucket; book untouched
    step(1, update("3", "web", txt(900), txt(80)))
    val s1 = Seq("web" -> txt(100), "web" -> txt(300), "web" -> txt(80),
      "book" -> txt(5000))
    assert(sinkDocs(sink) == expected(s1))

    // replay converges
    step(1, update("3", "web", txt(900), txt(80)))
    assert(sinkDocs(sink) == expected(s1))

    // deleting book's only doc retracts the book row entirely
    step(2, delete("4", "book", txt(5000)))
    val s2 = Seq("web" -> txt(100), "web" -> txt(300), "web" -> txt(80))
    assert(sinkDocs(sink) == expected(s2))
    assert(!sinkDocs(sink).contains("book"))
  }
}
