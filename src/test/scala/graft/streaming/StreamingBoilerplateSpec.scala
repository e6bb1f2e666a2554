package graft.streaming

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Streaming boilerplate == an independent in-memory q94 recompute at
  * every step of a replayed changelog. The crux under test is the
  * MOVING THRESHOLD: adding/removing a document to a source changes
  * 0.9·ndocs, which must flip vocabulary membership — and re-score
  * resident documents — that the batch itself never touched. */
class StreamingBoilerplateSpec extends SparkSuite {
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
  private def update(id: String, src: String, oldT: String, newT: String) =
    rec(s"""{"before":${img(id, src, oldT)},"after":${img(id, src, newT)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, src: String, text: String) =
    rec(s"""{"before":${img(id, src, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** Independent q94 semantics: boiler(source) = tokens in > 90% of the
    * source's docs; per doc count token INSTANCES. */
  private def expected(state: Seq[(String, String, String)]): Map[String, (Long, Long, Double)] = {
    val bySrc = state.groupBy(_._2)
    val boiler: Map[String, Set[String]] = bySrc.map { case (src, docs) =>
      val nd = docs.size
      val df = docs.flatMap { case (_, _, t) =>
        t.trim.split("\\s+").distinct.map(_ -> 1) }
        .groupBy(_._1).view.mapValues(_.size)
      src -> df.filter { case (_, n) => n > 0.9 * nd }.keySet.toSet
    }
    state.map { case (id, src, t) =>
      val toks = t.trim.split("\\s+")
      val nb = toks.count(boiler(src))
      id -> (toks.length.toLong, nb.toLong,
        math.rint((1.0 - nb.toDouble / toks.length) * 1e6) / 1e6)
    }.toMap
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, (Long, Long, Double)] =
    sink.docs("boilerplate").map { case (id, d) =>
      id -> (d("n_tokens").asInstanceOf[Long], d("n_boiler").asInstanceOf[Long],
        math.rint(d("content_ratio").asInstanceOf[Double] * 1e6) / 1e6)
    }.toMap

  test("moving threshold flips re-score untouched residents; replay " +
      "is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sboiler")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingBoilerplate.boilerplateView(spark, stateDir)))
    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    val a = "nav home alpha beta"
    val b = "nav home gamma delta"
    val c = "nav home epsilon zeta"
    val dNoNav = "eta theta iota"
    val dNav = "nav kappa lambda"
    val x = "totally different words here"

    // batch 0: three s1 docs sharing 'nav home' (df 3/3 > 2.7 → boiler)
    // plus an unrelated source
    step(0, create("a", "s1", a), create("b", "s1", b),
      create("c", "s1", c), create("x", "s2", x))
    var state = Seq(("a", "s1", a), ("b", "s1", b), ("c", "s1", c),
      ("x", "s2", x))
    assert(sinkDocs(sink) == expected(state))
    assert(sinkDocs(sink)("a")._2 == 2, "nav+home boiler in a")

    // batch 1: a 4th s1 doc WITHOUT nav — df stays 3, threshold rises
    // to 3.6 → 'nav home' flip OUT; a/b/c re-score though untouched
    step(1, create("d", "s1", dNoNav))
    state = state :+ (("d", "s1", dNoNav))
    assert(sinkDocs(sink) == expected(state))
    assert(sinkDocs(sink)("a")._2 == 0, "threshold rise must deflag a")

    // batch 2: d gains nav → df 4 > 3.6 → 'nav' (not 'home') flips back
    step(2, update("d", "s1", dNoNav, dNav))
    state = state.filterNot(_._1 == "d") :+ (("d", "s1", dNav))
    assert(sinkDocs(sink) == expected(state))
    assert(sinkDocs(sink)("a")._2 == 1, "nav back, home still out")

    // batch 3: delete d → 3/3 again, both tokens boiler again
    step(3, delete("d", "s1", dNav))
    state = state.filterNot(_._1 == "d")
    assert(sinkDocs(sink) == expected(state))
    assert(sinkDocs(sink)("a")._2 == 2)

    // replay of batch 3 (crash-redelivery) must change nothing
    step(3, delete("d", "s1", dNav))
    assert(sinkDocs(sink) == expected(state))

    // s2 stayed correct throughout
    assert(sinkDocs(sink)("x")._1 == 4)
  }
}
