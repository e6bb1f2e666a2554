package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the continuous form of batch
  * q69 — built on `flatMapGroupsWithState` with an EVENT-TIME timeout:
  * Structured Streaming's arbitrary-stateful path, used here because the
  * operator's state is genuinely custom (a set of open event-time
  * intervals per user that must merge on out-of-order arrivals and emit
  * exactly when the watermark proves them immutable). The built-in
  * `session_window` aggregation covers windowed AGGREGATES; this
  * operator demonstrates the general mechanism those are built from.
  *
  * Semantics (identical to q69's batch rule): events of one user belong
  * to the same session iff consecutive event times differ by LESS than
  * `gapUs`; a session closes once the watermark passes its last event +
  * gap (no event that could extend it can still arrive — later input
  * below the watermark is explicitly dropped, mirroring the watermarked
  * window operators). Out-of-order events WITHIN the watermark merge
  * correctly, including bridging two open sessions into one.
  *
  * Scale/state posture:
  *  - State per user is the list of OPEN sessions only (almost always
  *    length 1); closed sessions leave state via the timeout, so state
  *    size tracks concurrently-active users, not history.
  *  - Events hash-partition by user (the groupByKey shuffle) — the same
  *    single-Exchange shape as the batch query, but the per-batch work
  *    is O(batch + open sessions), independent of corpus size.
  *  - Emission is append-mode and final: downstream sinks never see a
  *    session twice (contrast with the foreachBatch upsert views, which
  *    re-emit corrections — here the watermark contract buys finality).
  */
object StreamingSessionize {

  /** One maintained (possibly still open) session interval. */
  case class Sess(startUs: Long, lastUs: Long, n: Long)

  /** An emitted, watermark-finalized session. */
  case class ClosedSession(user_id: Long, start_us: Long, n_events: Long,
      duration_us: Long)

  /** 12 h in microseconds — q69's idle threshold. */
  val DefaultGapUs: Long = 43200000000L

  /** Sessionize a streaming frame with (user_id, ts timestamp, event_id)
    * columns. `delay` is the out-of-orderness bound (watermark). */
  def sessions(events: DataFrame, gapUs: Long = DefaultGapUs,
      delay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id").cast("long"), col("ts"), col("event_id").cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[Sess], ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[List[Sess]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // drop input strictly BELOW the watermark; an event exactly at
          // ts == wm is kept, which is safe — a closed session required
          // lastUs + gap <= wm, so an at-watermark event can never
          // extend one. Same too-late contract as window aggs.
          val fresh = it.map { case (_, ts, _) =>
            ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
          }.filter(_ >= wmUs).toArray.sorted

          // merge new events into the open-interval set: linear sweep
          // over (existing sessions ∪ new singleton events) in start
          // order, gluing neighbors closer than the gap — bridging
          // events merge two formerly-separate sessions
          val merged = (state.getOption.getOrElse(Nil) ++
            fresh.map(t => Sess(t, t, 1)))
            .sortBy(s => (s.startUs, s.lastUs))
            .foldLeft(List.empty[Sess]) {
              case (cur :: rest, s) if s.startUs - cur.lastUs < gapUs =>
                Sess(cur.startUs, math.max(cur.lastUs, s.lastUs),
                  cur.n + s.n) :: rest
              case (acc, s) => s :: acc
            }.reverse

          val (closed, open) = merged.partition(_.lastUs + gapUs <= wmUs)
          if (open.nonEmpty) {
            state.update(open)
            // fire when the watermark passes the earliest possible close
            state.setTimeoutTimestamp(
              open.map(_.lastUs + gapUs).min / 1000L + 1)
          } else state.remove()

          closed.iterator.map(s =>
            ClosedSession(user, s.startUs, s.n, s.lastUs - s.startUs))
      }
  }
}
