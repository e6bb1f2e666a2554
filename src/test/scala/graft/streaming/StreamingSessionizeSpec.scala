package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** flatMapGroupsWithState sessionization: watermark-final emission,
  * out-of-order merge, and set-equality with batch q69 on replayed
  * corpus data. */
class StreamingSessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).toInstant.getEpochSecond * 1000000L

  test("sessions close exactly when the watermark passes last event + gap") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val events = stream.toDS().toDF("user_id", "ts", "event_id")
    // 1-hour gap, zero-delay watermark for deterministic stepping
    val q = StreamingSessionize.sessions(events, gapUs = 3600000000L,
        delay = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // one session of 3 events, delivered OUT OF ORDER within the batch
    stream.addData(
      (1L, ts("2021-03-01 10:30:00"), 2L),
      (1L, ts("2021-03-01 10:00:00"), 1L),
      (1L, ts("2021-03-01 10:50:00"), 3L))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0,
      "open session must not emit before the watermark passes")

    // second user's activity advances the watermark past 11:50 only
    // after the NEXT batch; 12:00 > 10:50+1h closes user 1's session
    stream.addData((2L, ts("2021-03-01 12:00:00"), 4L))
    q.processAllAvailable()
    stream.addData((2L, ts("2021-03-01 12:10:00"), 5L))
    q.processAllAvailable()

    val out = spark.table("sess_out")
      .as[StreamingSessionize.ClosedSession].collect().toSet
    assert(out == Set(StreamingSessionize.ClosedSession(
      1L, us("2021-03-01 10:00:00"), 3L, 3000000000L)),
      s"got $out")
    q.stop()
  }

  test("a bridging event merges two open sessions; counts never double") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val events = stream.toDS().toDF("user_id", "ts", "event_id")
    val q = StreamingSessionize.sessions(events, gapUs = 3600000000L,
        delay = "4 hours") // generous watermark: everything stays open
      .writeStream.format("memory").queryName("bridge_out")
      .outputMode("append").start()

    // two events 100 minutes apart: two separate open sessions
    stream.addData(
      (7L, ts("2021-03-01 10:00:00"), 1L),
      (7L, ts("2021-03-01 11:40:00"), 2L))
    q.processAllAvailable()
    // the bridge arrives LATE (event time between them, still inside
    // the watermark): all three must fuse into ONE session
    stream.addData((7L, ts("2021-03-01 10:50:00"), 3L))
    q.processAllAvailable()
    // close it out: advance the watermark far past 11:40+1h
    stream.addData((8L, ts("2021-03-02 09:00:00"), 4L))
    q.processAllAvailable()
    stream.addData((8L, ts("2021-03-02 10:00:00"), 5L))
    q.processAllAvailable()

    val out = spark.table("bridge_out")
      .as[StreamingSessionize.ClosedSession].collect()
      .filter(_.user_id == 7L).toSet
    assert(out == Set(StreamingSessionize.ClosedSession(
      7L, us("2021-03-01 10:00:00"), 3L, 6000000000L)),
      s"got $out")
    q.stop()
  }

  test("replayed corpus: emitted sessions equal batch q69") {
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // arrival in event-time order across batches (so no cross-batch
    // arrival falls behind the watermark; WITHIN-batch disorder is
    // covered by the dedicated tests above)
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)].collect()
      .sortBy(r => (r._2.getTime, r._3))

    val stream = MemoryStream[(Long, Timestamp, Long)]
    val events = stream.toDS().toDF("user_id", "ts", "event_id")
    val q = StreamingSessionize.sessions(events, delay = "10 minutes")
      .writeStream.format("memory").queryName("replay_out")
      .outputMode("append").start()

    // three arbitrary arrival batches (NOT time-ordered: rows come in
    // table order, so batches interleave event time within the
    // watermark's tolerance at this data's density)
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      stream.addData(chunk.toSeq); q.processAllAvailable()
    }
    // sentinel far past every session's close, one per user, then one
    // more batch so the advanced watermark actually fires the timeouts
    val users = rows.map(_._1).distinct
    stream.addData(users.map(u =>
      (u, ts("2034-01-01 00:00:00"), -1L)).toSeq)
    q.processAllAvailable()
    stream.addData(Seq((users.head, ts("2034-01-01 01:00:00"), -2L)))
    q.processAllAvailable()

    val streamed = spark.table("replay_out")
      .as[StreamingSessionize.ClosedSession].collect()
      .map(c => (c.user_id, c.start_us, c.n_events, c.duration_us)).toSet

    val batch = graft.SparkEntry.queries("q69_sessionize")(spark, dir)
      .select("user_id", "start_us", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.subsetOf(streamed), {
      val missing = batch -- streamed
      s"${missing.size} batch sessions missing, e.g. ${missing.take(3)}"
    })
    // streamed may additionally contain the sentinel singletons only
    val extras = streamed -- batch
    assert(extras.forall(_._3 == 1L), s"unexpected non-sentinel extras: ${extras.take(3)}")
    q.stop()
  }
}
