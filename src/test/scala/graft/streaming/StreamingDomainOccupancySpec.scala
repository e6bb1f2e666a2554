package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Provenance

/** Streaming per-domain occupancy == batch recompute at every step of a
  * replayed document changelog — both sides run the SAME
  * [[Provenance.registeredDomain]] parse, so the pin here is the ±
  * counter plumbing: inserts land on one domain, deletes retract from
  * exactly that domain, an emptied domain leaves the sink, replay is
  * idempotent, and bare-suffix ids group under "(none)". */
class StreamingDomainOccupancySpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private def expected(
      state: Seq[(String, String)]): Map[String, (String, Long, Long)] =
    if (state.isEmpty) Map.empty
    else state.toDF("doc_id", "text")
      .groupBy(coalesce(
        Provenance.registeredDomain(col("doc_id").cast("long")),
        lit("(none)")).as("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0)).cast("long")).as("n_tokens"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  private def sinkDocs(
      sink: InMemoryUpsertSink): Map[String, (String, Long, Long)] =
    sink.docs("domain_stats").map { case (id, d) =>
      id -> ((d("registered_domain").asInstanceOf[String],
        d("n_docs").asInstanceOf[Long],
        d("n_tokens").asInstanceOf[Long]))
    }.toMap

  test("occupancy == batch recompute; deletes retract from the entering " +
      "domain; emptied domains leave; bare-suffix ids land in (none); " +
      "replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdomain")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingDomainOccupancy.domainStatsView(spark, stateDir)))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch recompute")
    }

    // ids chosen to spread over several domains; 194 (foo.ck, wildcard
    // bare suffix) and 388 (demo.kawasaki.jp) plant hosts with a null
    // registered domain -> "(none)"
    val docs = (Seq(194L, 388L) ++ (1L to 30L)).map(i =>
      i.toString -> s"doc body number $i with a few tokens")
    state = docs.toMap
    step(0, docs.map { case (id, t) => create(id, t) }: _*)
    assert(sinkDocs(sink).size > 2, "32 docs should spread over domains")
    assert(sinkDocs(sink).values.map(_._2).sum == 32L)
    assert(sinkDocs(sink).values.exists(_._1 == "(none)"),
      "bare-suffix docs must surface as the (none) row")
    assert(sinkDocs(sink).values.find(_._1 == "(none)").get._2 == 2L)

    // a text edit changes n_tokens on its domain only (the parse is
    // id-pure, so the doc cannot move)
    val before = sinkDocs(sink)
    state += ("7" -> "short now")
    step(1, update("7", docs.toMap.apply("7"), "short now"))
    val after = sinkDocs(sink)
    assert(before.keySet == after.keySet)
    assert(before.count { case (k, v) => after(k) != v } == 1)

    // deleting every doc of one domain retracts the domain row; domain
    // lookup for all ids in ONE job, not one Spark job per id
    val texts = docs.toMap + ("7" -> "short now")
    val domainOf: Map[String, String] = texts.keys.toSeq.toDF("doc_id")
      .select(col("doc_id"), coalesce(
        Provenance.registeredDomain(col("doc_id").cast("long")),
        lit("(none)")).as("d"))
      .as[(String, String)].collect().toMap
    val targetDomain = domainOf(texts.keys.head)
    val victims = texts.keys.toSeq.filter(id => domainOf(id) == targetDomain)
    assert(victims.nonEmpty)
    state = texts -- victims
    step(2, victims.map(id => delete(id, texts(id))): _*)
    assert(!sinkDocs(sink).values.exists(_._1 == targetDomain))

    // replay idempotence
    val b3 = Seq(create("100", "late arrival text")).toDF("table", "value", "seq")
    state += ("100" -> "late arrival text")
    pipeline.processBatch(b3, Some(3L))
    pipeline.processBatch(b3, Some(3L))
    assert(sinkDocs(sink) == expected(state.toSeq))
  }
}
