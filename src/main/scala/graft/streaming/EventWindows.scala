package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time windowed aggregation — Structured Streaming's
  * native stateful path (readStream → withWatermark → window → agg),
  * the event-time capability the reference lacks entirely (SURVEY §2.4:
  * no WATERMARK clause, no event-time window in any reference query).
  *
  * The watermark bounds state: windows older than (max event time seen −
  * delay) are finalized and evicted, which is what makes this run forever
  * at 100 TB/day rates — unlike the reference's unbounded idle state
  * (idle-state-retention 0/0, sql-client-conf.yaml:33-34).
  */
object EventWindows {

  /** Per-(window, event_type) counts/sums over an event stream with a
    * `ts` timestamp column. `delay` is the out-of-orderness bound. */
  def tumbling(events: DataFrame, windowLen: String = "1 hour",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("total"))

  /** Sliding windows: each event contributes to len/slide windows; state
    * per open window, evicted at watermark + len like tumbling. Batch
    * shape (oracle-checked): q17_sliding_window. */
  def sliding(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("total"))

  /** Session windows: per-key sessions that extend while events arrive
    * within `gap` of the last and close once the watermark passes
    * last + gap — Structured Streaming merges overlapping per-event
    * [ts, ts+gap) intervals in state, the dynamic-gap analog of the
    * batch q18 form (oracle-checked). */
  def session(events: DataFrame, gap: String = "8 hours",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("cnt"), col("total"))
}
