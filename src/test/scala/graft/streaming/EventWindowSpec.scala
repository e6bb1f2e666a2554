package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Watermarked streaming window agg: append-mode emission after the
  * watermark passes, late-beyond-watermark events dropped. */
class EventWindowSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows finalize on watermark; too-late events are dropped") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val events = stream.toDS().toDF("ts", "event_type", "value")

    val query = EventWindows.tumbling(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()

    // two events in hour 10, one in hour 11
    stream.addData(
      (ts("2021-03-01 10:05:00"), "click", 1.0),
      (ts("2021-03-01 10:40:00"), "click", 2.0),
      (ts("2021-03-01 11:02:00"), "view", 5.0))
    query.processAllAvailable()
    // hour-10 window not final yet (watermark = 11:02 - 10m < 11:00)
    assert(spark.table("win_out").count() == 0)

    // advance event time past 11:10 → hour-10 window finalizes
    stream.addData((ts("2021-03-01 11:20:00"), "view", 7.0))
    query.processAllAvailable()
    val afterFirst = spark.table("win_out")
      .select("window_start", "event_type", "cnt", "total")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(afterFirst == Set((ts("2021-03-01 10:00:00"), "click", 2L, 3.0)))

    // an event far behind the watermark is dropped, not re-opened
    stream.addData((ts("2021-03-01 10:10:00"), "click", 100.0))
    // and closing out hour 11 must NOT include the dropped late row
    stream.addData((ts("2021-03-01 12:30:00"), "view", 0.5))
    query.processAllAvailable()
    val finalRows = spark.table("win_out")
      .select("window_start", "event_type", "cnt", "total")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(finalRows.contains((ts("2021-03-01 11:00:00"), "view", 2L, 12.0)))
    assert(!finalRows.exists(r => r._1 == ts("2021-03-01 10:00:00") && r._4 == 103.0),
      "late event beyond watermark must not mutate a finalized window")

    query.stop()
  }

  test("sliding windows: each event lands in len/slide windows") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val events = stream.toDS().toDF("ts", "event_type", "value")

    val query = EventWindows.sliding(events, "1 hour", "30 minutes",
        "10 minutes")
      .writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()

    // 10:40 belongs to windows [10:00,11:00) and [10:30,11:30)
    stream.addData((ts("2021-03-01 10:40:00"), "click", 2.0))
    // push the watermark past 11:30+10m to finalize both
    stream.addData((ts("2021-03-01 12:00:00"), "view", 1.0))
    stream.addData((ts("2021-03-01 14:00:00"), "view", 1.0))
    query.processAllAvailable()

    val rows = spark.table("slide_out")
      .filter(col("event_type") === "click")
      .select("window_start", "cnt", "total")
      .as[(Timestamp, Long, Double)].collect().toSet
    assert(rows == Set(
      (ts("2021-03-01 10:00:00"), 1L, 2.0),
      (ts("2021-03-01 10:30:00"), 1L, 2.0)))
    query.stop()
  }

  test("session windows: gap-merge in state, close at watermark past last+gap") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val events = stream.toDS().toDF("ts", "user_id", "value")

    val query = EventWindows.session(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // u1: 10:00 and 10:50 merge (gap < 1h); 13:00 starts a new session —
    // arriving ACROSS batches, so the merge happens in state
    stream.addData((ts("2021-03-01 10:00:00"), 1L, 1.0))
    stream.addData((ts("2021-03-01 10:50:00"), 1L, 2.0))
    query.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // still open

    stream.addData((ts("2021-03-01 13:00:00"), 1L, 4.0))
    query.processAllAvailable()
    val afterClose = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "cnt", "total")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    // watermark 13:00-10m > 10:50+1h finalized the first session
    assert(afterClose == Set(
      (1L, ts("2021-03-01 10:00:00"), ts("2021-03-01 11:50:00"), 2L, 3.0)))
    query.stop()
  }
}
