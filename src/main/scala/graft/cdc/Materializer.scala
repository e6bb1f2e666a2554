package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog → upsert-table materialization: the keystone custom piece
  * (SURVEY §7.2 step 3). A Debezium changelog is a totally-ordered stream
  * of (key, op, before, after) events; the *dynamic table* it encodes is,
  * at any point, the latest surviving row per key — exactly what the
  * reference's primary-keyed Elasticsearch sinks materialize
  * (flink-ddl.sql:96-109).
  *
  * Scale posture: `max_by` aggregation, not a row_number window —
  * partial-aggregatable (map-side combine shrinks the shuffle to one row
  * per key per map partition), no per-key sort, no skew serialization.
  */
object Materializer {

  /** Compact a normalized changelog (columns key, op, before, after,
    * ts_ms, seq — see [[Debezium.normalize]]) to its latest event per key,
    * KEEPING delete tombstones. Same shape out. */
  def compact(changelog: DataFrame): DataFrame =
    changelog
      .groupBy("key")
      .agg(max_by(
        struct(col("op"), col("before"), col("after"), col("ts_ms"),
          col("seq")),
        struct(col("ts_ms"), col("seq"))).as("last"))
      .select(col("key"), col("last.op").as("op"),
        col("last.before").as("before"), col("last.after").as("after"),
        col("last.ts_ms").as("ts_ms"), col("last.seq").as("seq"))

  /** Materialize the dynamic table: latest row per key, deletes removed,
    * after-image flattened to its columns plus the leading `key`. */
  def latestRows(changelog: DataFrame): DataFrame =
    compact(changelog)
      .filter(col("op") =!= "d")
      .select(col("key"), col("after.*"))
}
