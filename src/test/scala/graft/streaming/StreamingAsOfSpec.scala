package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.AsOf

/** Incremental as-of attribution == batch asofBackward over the current
  * state, at every step of a replayed event changelog — including the
  * cases a batch join never faces: a LATE click re-attributing an
  * already-emitted purchase, a click delete reverting it, a purchase
  * moving in time, and a purchase delete retracting its sink doc. */
class StreamingAsOfSpec extends SparkSuite {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", StringType), StructField("user_id", StringType),
    StructField("ts", LongType), StructField("event_type", StringType)))
  private val sources =
    Seq(TableSpec("events", evSchema, primaryKey = Seq("event_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("events", env, seqNo)
  }
  private def img(id: String, u: String, ts: Long, typ: String) =
    s"""{"event_id":"$id","user_id":"$u","ts":$ts,"event_type":"$typ"}"""
  private def create(id: String, u: String, ts: Long, typ: String) =
    rec(s"""{"before":null,"after":${img(id, u, ts, typ)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, u: String, oldTs: Long, newTs: Long, typ: String) =
    rec(s"""{"before":${img(id, u, oldTs, typ)},"after":${img(id, u, newTs, typ)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, u: String, ts: Long, typ: String) =
    rec(s"""{"before":${img(id, u, ts, typ)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** Batch recompute with the SAME operator over current state. */
  private def batchRecompute(state: DataFrame): Map[String, (Option[String], Option[Long])] = {
    val lefts = state.filter(col("event_type") === "purchase")
      .select(col("user_id").as("jk"), col("event_id").as("left_id"), col("ts"))
    val rights = state.filter(col("event_type") === "click")
      .select(col("user_id").as("jk"), col("event_id"), col("ts"))
    AsOf.asofBackward(lefts, rights, Seq("jk"), "ts", "ts",
      Seq("event_id" -> "right_id", "ts" -> "right_ts"))
      .select("left_id", "right_id", "right_ts")
      .as[(String, Option[String], Option[Long])].collect()
      .map { case (p, r, t) => p -> (r, t) }.toMap
  }

  private def sinkAtt(sink: InMemoryUpsertSink): Map[String, (Option[String], Option[Long])] =
    sink.docs("purchase_attribution").map { case (id, d) =>
      id -> (Option(d("right_id")).map(_.toString),
        Option(d("right_ts")).map(_.asInstanceOf[Long]))
    }.toMap

  test("incremental attribution equals batch as-of after every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sasof")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAsOf.attributionView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkAtt(sink) == batchRecompute(pipeline.state("events")),
        s"batch $batchId: incremental != batch as-of")
    }

    // c1 before p1; p2 has no prior click; an unrelated 'view' event
    // must not participate
    step(0, create("c1", "u1", 10, "click"),
      create("p1", "u1", 50, "purchase"),
      create("p2", "u2", 40, "purchase"),
      create("v1", "u1", 45, "view"))
    assert(sinkAtt(sink) == Map(
      "p1" -> (Some("c1"), Some(10L)), "p2" -> (None, None)))

    // LATE clicks: c2 re-attributes the already-emitted p1; c3 gives
    // p2 its first attribution
    step(1, create("c2", "u1", 30, "click"),
      create("c3", "u2", 35, "click"))
    assert(sinkAtt(sink) == Map(
      "p1" -> (Some("c2"), Some(30L)), "p2" -> (Some("c3"), Some(35L))))

    // click delete reverts p1 to c1
    step(2, delete("c2", "u1", 30, "click"))
    assert(sinkAtt(sink)("p1") == (Some("c1"), Some(10L)))

    // purchase moves before its click → attribution becomes null;
    // purchase delete retracts the sink doc
    step(3, update("p1", "u1", 50, 5, "purchase"),
      delete("p2", "u2", 40, "purchase"))
    assert(sinkAtt(sink) == Map("p1" -> (None, None)))

    // replay the last batch: state merges skip, sink converges
    pipeline.processBatch(
      Seq(update("p1", "u1", 50, 5, "purchase"),
        delete("p2", "u2", 40, "purchase")).toDF("table", "value", "seq"),
      Some(3L))
    assert(sinkAtt(sink) == Map("p1" -> (None, None)))
    assert(sinkAtt(sink) == batchRecompute(pipeline.state("events")))
  }
}
