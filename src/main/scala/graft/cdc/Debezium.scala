package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope decoding — the ingest format of every source in
  * the reference (SURVEY §1.1/§2.1 S1/S8/S9).
  *
  * Two wire variants, mirrored from the captured golden samples:
  *  - MySQL (reference: sample/cdc.orders.change-log-mysql.json:17-113):
  *    `before`/`after` are typed structs of the row schema, plus
  *    `source` metadata, `op` (c/u/d/r) and `ts_ms`.
  *  - MongoDB (reference: sample/cdc.crawler.change-log-mongodb.json:8-44):
  *    `after`/`patch`/`filter` are raw JSON *strings*
  *    (`io.debezium.data.Json`) — semi-structured payloads handled with
  *    JSON functions downstream, exactly like the reference's
  *    `content STRING` table (flink-mongodb.sql:1-5).
  *
  * Messages may arrive with or without the Connect `{schema, payload}`
  * wrapper (the samples include it); `decode` handles both. Parse errors
  * yield null envelopes and are filtered out — the behavior of the
  * reference's 'debezium-json.ignore-parse-errors' = 'true'
  * (README.md:148); pass `tolerant = false` for the strict Mongo-stream
  * setting (flink-mongodb.sql:13), which fails the batch on corrupt input.
  *
  * Everything here is declarative Column expressions — whole-stage
  * codegen'd JSON parsing, no UDFs, scale-independent.
  */
object Debezium {

  /** Source-metadata struct, common subset of the MySQL and Mongo variants
    * (sample/cdc.orders.change-log-mysql.json:66-96). Only fields our
    * pipeline reads; from_json ignores extras on the wire. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("collection", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType)))

  /** Envelope for relational (MySQL) CDC: typed before/after images. */
  def mysqlEnvelope(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Envelope for MongoDB CDC: document images are JSON strings. */
  val mongoEnvelope: StructType = StructType(Seq(
    StructField("after", StringType),
    StructField("patch", StringType),
    StructField("filter", StringType),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Unwrap the optional Connect `{schema, payload}` wrapper: if the value
    * has a `payload` member use that JSON subtree, else the value itself. */
  private def unwrapped(value: Column): Column =
    coalesce(get_json_object(value, "$.payload"), value)

  /** Decode a column of raw Debezium JSON into an envelope struct column.
    * With `tolerant` (default), unparseable records become null structs —
    * drop them with `.filter(col("env").isNotNull)`. */
  def decode(value: Column, envelope: StructType, tolerant: Boolean = true): Column = {
    val opts =
      if (tolerant) Map("mode" -> "PERMISSIVE")
      else Map("mode" -> "FAILFAST")
    from_json(unwrapped(value), envelope, opts)
  }

  /** Normalize decoded MySQL envelopes to the engine's changelog shape:
    * (key, op, before, after, ts_ms, seq) — SURVEY §7.1.
    *
    *  - `key`: primary-key values (after-image, falling back to before for
    *    deletes), concat-separated — drives materialization and sink doc
    *    ids (reference: PRIMARY KEY NOT ENFORCED, flink-ddl.sql:9).
    *  - `before`/`after`: full row images — downstream retraction needs
    *    the old image (which group a row is LEAVING), not just the new one
    *    (reference: "要加入撤回功能", flink-ddl.sql:213).
    *  - `seq`: caller-supplied total order within equal ts_ms (Kafka offset
    *    in production; fixture line number in tests). Debezium emits ts_ms
    *    at millisecond grain, so a same-key burst needs it for a stable
    *    "latest".
    *
    * Input df must have an `env` struct column (from [[decode]]) and the
    * seq column; rows with null envelopes (parse errors) are dropped.
    */
  /** Normalize decoded MongoDB envelopes to the same changelog shape. The
    * row shape is the reference's `comments` table: (id STRING, content
    * STRING) — id extracted from the Mongo `_id.$oid`, content = the raw
    * document JSON string (flink-mongodb.sql:1-5; envelope
    * sample/cdc.crawler.change-log-mongodb.json:46). Deletes carry only
    * `filter`, so the key falls back to it; before-images don't exist in
    * the Mongo envelope (null). */
  def normalizeMongo(df: DataFrame, seqCol: String = "seq"): DataFrame = {
    val rowType = StructType(Seq(
      StructField("id", StringType), StructField("content", StringType)))
    def oid(c: Column): Column = get_json_object(c, "$._id.$oid")
    val key = coalesce(oid(col("env.after")), oid(col("env.filter")))
    df.filter(col("env").isNotNull && col("env.op").isNotNull)
      .select(
        key.as("key"),
        col("env.op").as("op"),
        lit(null).cast(rowType).as("before"),
        when(col("env.op") =!= "d",
          struct(key.as("id"), col("env.after").as("content")))
          .otherwise(lit(null).cast(rowType)).as("after"),
        col("env.ts_ms").as("ts_ms"),
        col(seqCol).cast(LongType).as("seq"))
  }

  def normalize(df: DataFrame, pk: Seq[String], seqCol: String = "seq"): DataFrame = {
    val keyParts = pk.map(c =>
      coalesce(col(s"env.after.$c"), col(s"env.before.$c")).cast(StringType))
    df.filter(col("env").isNotNull && col("env.op").isNotNull)
      .select(
        concat_ws("\u0001", keyParts: _*).as("key"),
        col("env.op").as("op"),
        col("env.before").as("before"),
        col("env.after").as("after"),
        col("env.ts_ms").as("ts_ms"),
        col(seqCol).cast(LongType).as("seq"))
  }
}
