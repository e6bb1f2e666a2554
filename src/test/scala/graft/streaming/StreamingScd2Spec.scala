package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Temporal

/** Incremental SCD2 history == batch q158's interval builder over the
  * current state, at every step of a replayed event changelog —
  * including the cases a batch build never faces: a LATE event
  * renumbering later versions, a middle-event delete re-gluing the
  * adjacent intervals and retracting the stale highest version, a
  * payload update rewriting a row in place, and an emptied user
  * retracting its whole history. */
class StreamingScd2Spec extends SparkSuite {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", StringType), StructField("user_id", StringType),
    StructField("ts", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))
  private val sources =
    Seq(TableSpec("events", evSchema, primaryKey = Seq("event_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("events", env, seqNo)
  }
  private def img(id: String, u: String, ts: Long, typ: String, v: Double) =
    s"""{"event_id":"$id","user_id":"$u","ts":$ts,"event_type":"$typ","value":$v}"""
  private def create(id: String, u: String, ts: Long, typ: String, v: Double) =
    rec(s"""{"before":null,"after":${img(id, u, ts, typ, v)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, u: String, ts: Long, typ: String,
      oldV: Double, newV: Double) =
    rec(s"""{"before":${img(id, u, ts, typ, oldV)},"after":${img(id, u, ts, typ, newV)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, u: String, ts: Long, typ: String, v: Double) =
    rec(s"""{"before":${img(id, u, ts, typ, v)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private type Row8 =
    (String, Long, String, String, Double, Long, Option[Long], Boolean)

  /** Batch recompute with the SAME operator over current state. */
  private def batchRecompute(state: DataFrame): Set[Row8] =
    Temporal.scd2Intervals(
      state.select(col("user_id").as("user"), col("event_id"),
        col("ts").cast("long").as("ts"), col("event_type"), col("value")),
      userCol = "user", tsNsCol = "ts", idCol = "event_id")
      .select(col("user"), col("version"), col("event_id"),
        col("event_type"), col("value"), col("valid_from_ns"),
        col("valid_to_ns"), col("is_current"))
      .as[Row8].collect().toSet

  private def sinkRows(sink: InMemoryUpsertSink): Set[Row8] =
    sink.docs("scd2_history").values.map { d =>
      (d("user_id").toString, d("version").asInstanceOf[Long],
        d("event_id").toString, d("event_type").toString,
        d("value").asInstanceOf[Double],
        d("valid_from").asInstanceOf[Long],
        Option(d("valid_to")).map(_.asInstanceOf[Long]),
        d("is_current").asInstanceOf[Boolean])
    }.toSet

  test("incremental SCD2 equals batch interval rebuild after every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sscd2")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingScd2.scd2View(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("events")),
        s"batch $batchId: incremental != batch SCD2 rebuild")
    }

    // two users; u1's second event closes its first interval
    step(0, create("e1", "u1", 10, "click", 1.0),
      create("e2", "u1", 20, "view", 2.0),
      create("e3", "u2", 15, "signup", 5.0))
    assert(sinkRows(sink) == Set(
      ("u1", 1L, "e1", "click", 1.0, 10L, Some(20L), false),
      ("u1", 2L, "e2", "view", 2.0, 20L, None, true),
      ("u2", 1L, "e3", "signup", 5.0, 15L, None, true)))

    // LATE event at ts=5: every u1 version renumbers, e1's valid_from
    // interval is now preceded by e0's
    step(1, create("e0", "u1", 5, "purchase", 9.0))
    assert(sinkRows(sink) == Set(
      ("u1", 1L, "e0", "purchase", 9.0, 5L, Some(10L), false),
      ("u1", 2L, "e1", "click", 1.0, 10L, Some(20L), false),
      ("u1", 3L, "e2", "view", 2.0, 20L, None, true),
      ("u2", 1L, "e3", "signup", 5.0, 15L, None, true)))

    // payload update rewrites the current row in place (same version)
    step(2, update("e2", "u1", 20, "view", 2.0, 2.5))
    assert(sinkRows(sink).contains(("u1", 3L, "e2", "view", 2.5, 20L,
      None, true)))

    // deleting the MIDDLE event re-glues [5,10)+[10,20) → [5,20) and
    // retracts the stale version 3
    step(3, delete("e1", "u1", 10, "click", 1.0))
    assert(sinkRows(sink) == Set(
      ("u1", 1L, "e0", "purchase", 9.0, 5L, Some(20L), false),
      ("u1", 2L, "e2", "view", 2.5, 20L, None, true),
      ("u2", 1L, "e3", "signup", 5.0, 15L, None, true)))

    // an emptied user retracts its whole history
    step(4, delete("e3", "u2", 15, "signup", 5.0))
    assert(sinkRows(sink).forall(_._1 == "u1"))

    // replay idempotence: redelivering the last batch converges
    pipeline.processBatch(
      Seq(delete("e3", "u2", 15, "signup", 5.0)).toDF("table", "value", "seq"),
      Some(4L))
    assert(sinkRows(sink) == batchRecompute(pipeline.state("events")))
  }

  test("random event changelogs: SCD2 sink == batch rebuild per batch") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    case class Op(op: String, id: String, u: String, ts: Long, v: Double)
    val genOp: Gen[Op] = for {
      op <- Gen.frequency(4 -> "c", 3 -> "u", 2 -> "d")
      id <- Gen.oneOf("e1", "e2", "e3", "e4", "e5", "e6")
      u <- Gen.oneOf("u1", "u2", "u3")
      ts <- Gen.choose(1L, 50L)
      v <- Gen.choose(0, 99)
    } yield Op(op, id, u, ts, v.toDouble)

    // pre-images come from materialized state, so `before` only needs
    // to be non-null for u/d (same as the pipeline property spec)
    def envelope(o: Op, seq: Long): (String, String, Long) = {
      val i = img(o.id, o.u, o.ts, "evt", o.v)
      val b = if (o.op == "c") "null" else i
      val a = if (o.op == "d") "null" else i
      ("events", s"""{"before":$b,"after":$a,"op":"${o.op}","ts_ms":$seq}""",
        seq)
    }

    var seed = Seed(12L)
    (1 to 3).foreach { trial =>
      val ops = Gen.nonEmptyListOf(genOp)
        .pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      val sink = new InMemoryUpsertSink
      val stateDir = tmpDir(s"sscd2p-$trial")
      val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
        Seq(StreamingScd2.scd2View(spark, stateDir)))

      val records = ops.zipWithIndex.map { case (o, i) => envelope(o, i.toLong) }
      val batches = records.grouped(math.max(records.size / 3, 1)).toSeq
      batches.zipWithIndex.foreach { case (b, i) =>
        pipeline.processBatch(b.toDF("table", "value", "seq"), Some(i.toLong))
        assert(sinkRows(sink) == batchRecompute(pipeline.state("events")),
          s"trial $trial batch $i ops=$ops")
      }
    }
  }
}
