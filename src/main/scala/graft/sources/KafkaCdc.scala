package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: Kafka source of Debezium envelopes (reference: README.md:133-150 —
  * topic `<server>.<db>.<table>` like `shard1.ec.orders`, consumer group,
  * earliest-offset startup), mapped to the engine's source-agnostic CDC
  * input contract (table, value, seq [, proc_time]) consumed by
  * [[graft.streaming.CdcPipeline]].
  *
  * The topology mapping (`toCdcInput`) is a pure transformation and is
  * unit-tested against kafka-shaped frames; `stream` wires the actual
  * connector (requires the spark-sql-kafka package on the cluster — not
  * shipped in this build environment, which is also why no integration
  * test runs a broker).
  */
object KafkaCdc {

  /** Continuous source: subscribe to the CDC topics.
    * `startingOffsets=earliest` ≈ the reference's
    * 'scan.startup.mode' = 'earliest-offset' (README.md:222). */
  def stream(spark: SparkSession, bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest"): DataFrame =
    toCdcInput(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load())

  /** S7 topic-inspection debug surface (reference: kafka-dump.sh:3-6
    * console-consumer dump with keys; kafka-topics.sh listing): render a
    * kafka-shaped frame as human-readable dump lines. Driver-side by
    * design — it's a debugging tool, not a data path. */
  def inspect(kafka: DataFrame, n: Int = 20): Seq[String] =
    kafka.selectExpr("topic", "offset",
      "CAST(value AS STRING) AS value")
      .take(n)
      .map(r => s"${r.getAs[String]("topic")}@${r.getAs[Long]("offset")}: " +
        r.getAs[String]("value").take(120))

  /** Kafka record shape → CDC input contract:
    *  - table  = last topic segment (`shard1.ec.orders` → `orders`,
    *    reference: register-ec.json:11-12 topic naming)
    *  - value  = envelope JSON as string
    *  - seq    = kafka offset (the total order within a partition that
    *    [[graft.cdc.Debezium.normalize]] uses to break ts_ms ties)
    *  - proc_time = PROCTIME() ingest column (reference: flink-ddl.sql:10
    *    `proc_time AS PROCTIME()`; per-batch rather than per-record — no
    *    reference query observes the difference, SURVEY §2.3 F1)
    */
  def toCdcInput(kafka: DataFrame): DataFrame =
    kafka.select(
      element_at(split(col("topic"), "\\."), -1).as("table"),
      col("value").cast("string").as("value"),
      col("offset").cast("long").as("seq"),
      current_timestamp().as("proc_time"))
}
