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
}
