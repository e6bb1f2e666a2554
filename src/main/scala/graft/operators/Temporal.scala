package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Temporal / versioned-dimension operators — the SCD2 (slowly-changing
  * dimension, type 2) history table that CDC pipelines like the
  * reference's feed in production. The reference materializes only the
  * LATEST row per key (its ES upsert sinks, flink-ddl.sql:96-109;
  * batch analog q13); Flink's temporal-table join is the read side of
  * exactly this versioned shape. Here the full validity history is a
  * first-class operator: one row per (entity, version) with
  * [valid_from, valid_to) event-time intervals and an is_current flag.
  *
  * Scale design: one hash shuffle on the entity key, then a single
  * in-partition sort feeds lead() and row_number() in ONE Window
  * operator — no self-join of adjacent versions (the naive formulation)
  * and no second shuffle. Per-key work is bounded by that entity's own
  * change count, the same boundedness assumption any per-key history
  * view makes; entity count scales out with partitions.
  */
object Temporal {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Core SCD2 interval builder, shared verbatim by batch q158 and the
    * continuous [[graft.streaming.StreamingScd2]] view so the two
    * cannot drift. Input carries (`userCol`, `tsNsCol` LONG event time,
    * `idCol` tie-break) plus payload columns; output adds
    * (valid_from_ns, valid_to_ns NULL-for-current, version, is_current).
    * Ordering is (ts, id) — full file precision via the long ts so the
    * version sequence matches engines that order on nanos. */
  def scd2Intervals(events: DataFrame, userCol: String = "user_id",
      tsNsCol: String = "ts_ns", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsNsCol), col(idCol))
    events
      .withColumn("valid_from_ns", col(tsNsCol))
      .withColumn("valid_to_ns", lead(col(tsNsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to_ns").isNull)
  }

  val queries: Seq[QueryDef] = Seq(

    /** SCD2 history over the events stream: each user's event sequence
      * becomes versioned dimension rows, valid from its own event time
      * until superseded by the next (NULL = still current). Timestamps
      * surface second-formatted like q13's ts_sec; versions order on the
      * full-precision long time with event_id as tie-break in BOTH
      * engines, so the formatting can't mask an ordering divergence. */
    QueryDef("q158_scd2_history",
      "SELECT user_id, event_id, event_type, value, " +
        "strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from, " +
        "strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), " +
        "'%Y-%m-%d %H:%M:%S') AS valid_to, " +
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS BIGINT) AS version, " +
        "(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) " +
        "AS is_current FROM events") { (s, dir) =>
      val ev = t(s, dir, "events")
        .select("user_id", "event_id", "event_type", "value", "ts_ns")
      scd2Intervals(ev)
        // integral DIV: epoch-nanos ≈ 1.7e18 > 2^53, a double division
        // here would corrupt the microsecond (same pitfall Tables.load
        // documents; r11 ADVICE on syntheticHost)
        .withColumn("valid_from",
          expr("date_format(timestamp_micros(valid_from_ns DIV 1000), " +
            "'yyyy-MM-dd HH:mm:ss')"))
        .withColumn("valid_to",
          expr("date_format(timestamp_micros(valid_to_ns DIV 1000), " +
            "'yyyy-MM-dd HH:mm:ss')"))
        .select("user_id", "event_id", "event_type", "value",
          "valid_from", "valid_to", "version", "is_current")
    },

    /** Temporal-table join — Flink's `FOR SYSTEM_TIME AS OF` (the
      * HISTORICAL form of the reference's latest-only JDBC lookup join,
      * flink-ddl.sql:79-94): each probe row joins the dimension VERSION
      * that was valid at the probe's own event time, not the current
      * one. Probes are the purchase events; the versioned dimension is
      * the user's profile state built from their non-purchase events by
      * the same q158 interval builder, so the payload carries the
      * matched version number. Spark-side it is [[AsOf.asofBackward]]
      * (one shuffle on the key + one carry-forward window — never a
      * probe-per-row subquery); the DuckDB oracle is its native ASOF
      * JOIN against a windowed version CTE — an independent first-class
      * implementation of the semantics. Comparison runs on the LONG
      * nanos column: events carry sub-microsecond components, and a
      * micros-truncated compare could order a probe and a dimension row
      * differently than the oracle's full-precision timestamps.
      *
      * The matched VERSION NUMBER is fused into the same window pass: a
      * running count of dimension rows at-or-before the current row IS
      * the version of the row the carry-forward picked (dimension rows
      * sort before probes at equal ts, the ≤ tie rule). Composing the
      * q158 builder and then as-of joining against it would shuffle the
      * dimension twice on the same key; the fusion keeps the whole plan
      * to ONE Exchange — the form PlanSpec pins.
      *
      * Tie rule (r12 ADVICE): two dimension events for the same user at
      * the SAME ts_ns are possible (the MICROS file path makes ts_ns =
      * micros*1000), and an un-keyed last() would be nondeterministic.
      * Both engines resolve ties as LAST WRITE WINS by event id: the
      * Spark window adds state_event_id as a third ordering key so
      * last() picks the max-event_id row, and the oracle collapses the
      * dim to the max-event_id row per (user, ts) BEFORE the ASOF join
      * (ts is then unique per user, making ASOF deterministic). The
      * picked row's version still counts every dim event — shadowed
      * same-ts versions exist with zero-width validity, exactly q158's
      * numbering — and the two formulations agree by construction:
      * Spark's running dim count at the probe = all dim rows with
      * ts ≤ picked ts = the oracle's row_number of the max-event_id
      * row at that ts. */
    QueryDef("q160_temporal_join",
      "WITH dim AS (SELECT user_id, event_id, event_type, ts, version " +
        "FROM (SELECT user_id, event_id, event_type, ts, " +
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS BIGINT) AS version, " +
        "row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) " +
        "AS rn FROM events WHERE event_type <> 'purchase') WHERE rn = 1) " +
        "SELECT p.event_id, p.user_id, p.ts, d.event_id AS state_event_id, " +
        "d.event_type AS state_type, d.version AS state_version " +
        "FROM (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN dim d ON p.user_id = d.user_id AND d.ts <= p.ts") { (s, dir) =>
      val ev = t(s, dir, "events")
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(null).cast("long").as("state_event_id"),
          lit(null).cast("string").as("state_type"),
          col("ts_ns").as("_ts"), lit(1).as("_side"))
      val dim = ev.filter(col("event_type") =!= "purchase")
        .select(lit(null).cast("long").as("event_id"), col("user_id"),
          lit(null).cast("timestamp").as("ts"),
          col("event_id").as("state_event_id"),
          col("event_type").as("state_type"),
          col("ts_ns").as("_ts"), lit(0).as("_side"))
      // third key = tie-break among same-ts dim rows (probe-side nulls
      // sort first within their _side group; harmless — tied probes
      // read identical dim state either way)
      val w = Window.partitionBy("user_id")
        .orderBy(col("_ts"), col("_side"), col("state_event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nDim = count(when(col("_side") === 0, lit(1))).over(w)
      probes.unionByName(dim)
        .withColumn("state_event_id",
          last(col("state_event_id"), ignoreNulls = true).over(w))
        .withColumn("state_type",
          last(col("state_type"), ignoreNulls = true).over(w))
        .withColumn("state_version", when(nDim > 0, nDim))
        .filter(col("_side") === 1)
        .select("event_id", "user_id", "ts", "state_event_id",
          "state_type", "state_version")
    }
  )
}
