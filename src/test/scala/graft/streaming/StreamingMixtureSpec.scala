package graft.streaming

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Streaming source-mixture == batch q90 arithmetic over the current
  * document state at every step of a replayed changelog: per-stratum
  * token sums maintained ±, weights priced at read, empty strata
  * leaving the sink, replay idempotent. */
class StreamingMixtureSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, lang: String, src: String, text: String) =
    s"""{"doc_id":"$id","lang":"$lang","source":"$src","text":"$text"}"""
  private def create(id: String, lang: String, src: String, text: String) =
    rec(s"""{"before":null,"after":${img(id, lang, src, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, lang: String, src: String,
      oldT: String, newT: String) =
    rec(s"""{"before":${img(id, lang, src, oldT)},"after":${img(id, lang, src, newT)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, lang: String, src: String, text: String) =
    rec(s"""{"before":${img(id, lang, src, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** q90 arithmetic, independently: n_tok per (lang, source), weight =
    * round9(√n_tok) / Σ round9(√n_tok), rounded to 6. */
  private def expected(state: Seq[(String, String, String, String)]): Map[(String, String), (Long, Double)] = {
    val strata = state.groupBy(d => (d._2, d._3)).view.mapValues(
      _.map(_._4.trim.split("\\s+").length.toLong).sum).toMap
    val sqs = strata.view.mapValues(n =>
      BigDecimal(math.sqrt(n.toDouble).toString)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    val total = sqs.values.sum
    strata.map { case (k, n) =>
      k -> (n, math.rint((sqs(k) / total).toDouble * 1e6) / 1e6)
    }
  }

  private def sinkStrata(sink: InMemoryUpsertSink): Map[(String, String), (Long, Double)] = {
    val docs = sink.docs("source_mixture").values.toSeq
    if (docs.isEmpty) Map.empty
    else {
      val strata = docs.map(d => (d("lang").toString, d("source").toString,
        d("n_tok").asInstanceOf[Long])).toDF("lang", "source", "n_tok")
      StreamingCuration.mixtureWeights(strata)
        .as[(String, String, Long, Double)].collect()
        .map { case (l, s, n, w) =>
          (l, s) -> (n, math.rint(w * 1e6) / 1e6) }.toMap
    }
  }

  test("maintained strata + read-time weights equal batch q90 after " +
      "every batch; empty strata leave; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("smixture")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingCuration.sourceMixture(spark, stateDir)))
    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    val a = ("a", "en", "web", "one two three four")
    val b = ("b", "en", "web", "five six seven")
    val c = ("c", "de", "books", "acht neun")
    val d = ("d", "en", "wiki", "alpha beta gamma")

    step(0, create(a._1, a._2, a._3, a._4), create(b._1, b._2, b._3, b._4),
      create(c._1, c._2, c._3, c._4))
    var state = Seq(a, b, c)
    assert(sinkStrata(sink) == expected(state))

    // new stratum appears; existing stratum shrinks via update
    val b2 = ("b", "en", "web", "five six")
    step(1, create(d._1, d._2, d._3, d._4),
      update(b._1, b._2, b._3, b._4, b2._4))
    state = Seq(a, b2, c, d)
    assert(sinkStrata(sink) == expected(state))

    // stratum empties → leaves the sink entirely
    step(2, delete(c._1, c._2, c._3, c._4))
    state = Seq(a, b2, d)
    assert(sinkStrata(sink) == expected(state))
    assert(!sink.docs("source_mixture").values
      .exists(_("lang") == "de"), "emptied stratum must leave")

    // crash-redelivery of batch 2 changes nothing
    step(2, delete(c._1, c._2, c._3, c._4))
    assert(sinkStrata(sink) == expected(state))
  }
}
