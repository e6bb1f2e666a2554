package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.TableSpec
import graft.cdc.{Debezium, Materializer}

/** Read access to the pipeline's materialized state, pinned to one
  * version per table (pre- or post-merge). `apply` keeps the plain
  * `pre("orders")` full-snapshot form; `rows` is the bucket-pruned
  * touched-keys lookup incremental views use so per-batch reads track
  * the batch, not the state size. */
final class StateAccess(
    states: Map[String, ParquetKeyedTable],
    schema: String => StructType,
    versions: Map[String, Option[Int]]) {
  def apply(table: String): DataFrame =
    states(table).snapshotAt(versions(table), schema(table))
  def rows(table: String, keys: DataFrame): DataFrame =
    states(table).rowsForKeysAt(versions(table), schema(table), keys)
}

/** Batch-scoped context a view's maintenance runs under.
  *
  *  - `batchId`: the foreachBatch id, when the batch came from a stream —
  *    views with their own state stores thread it into those stores'
  *    merges so a REDELIVERED batch (crash between per-store commits)
  *    replays idempotently ([[ParquetKeyedTable.merge]]).
  *  - `defer`: registers cleanup (typically `unpersist()` of a frame the
  *    returned upserts/deletes still reference) to run AFTER the sink has
  *    consumed the view's output — releasing batch-scoped caches without
  *    forcing the sink to recompute their lineage. */
final class BatchCtx(val batchId: Option[Long]) {
  private val cleanups = scala.collection.mutable.Buffer.empty[() => Unit]
  def defer(f: => Unit): Unit = cleanups += (() => f)
  private[streaming] def close(): Unit = cleanups.foreach(_())
}

/** A continuously-maintained view: given the pre-batch state, post-batch
  * state, this batch's normalized changelog per table and the batch
  * context, emit the documents to upsert and the doc ids to delete. This
  * is the engine-side analog of one `INSERT INTO sink SELECT ...`
  * continuous job in the reference (README.md:342-345).
  *
  * `index` is the sink index the documents land in — several views may
  * share one index and have their fields partial-merged per doc id, the
  * reference's shared `user_view` index (flink-ddl.sql:143,165). Defaults
  * to the view name. */
final case class ViewDef(
    name: String,
    maintain: (StateAccess, StateAccess,
      Map[String, DataFrame], BatchCtx) => (DataFrame, DataFrame),
    index: String = null) {
  def sinkIndex: String = Option(index).getOrElse(name)
}

/** The continuous-ETL runner — Spark-first re-expression of the
  * reference's Flink streaming topology (SURVEY §3 entry points 1-2):
  * one micro-batched stream of Debezium envelopes (multiple "topics"
  * distinguished by a `table` column, like a multi-topic Kafka subscribe)
  * drives, per batch:
  *
  *   1. decode (`from_json`) + normalize to (key, op, before, after,
  *      ts_ms, seq) per source table,
  *   2. compact within the batch and MERGE into that table's materialized
  *      state ([[ParquetKeyedTable]]) — the *dynamic table*,
  *   3. re-derive each registered view for the AFFECTED KEYS ONLY and
  *      upsert/delete into the keyed sink.
  *
  * Affected-key recomputation is the semantically-safe mapping of Flink's
  * retraction streams onto micro-batches (SURVEY §7.2 step 4): an update
  * or delete on either join side, or a row leaving an aggregation group,
  * retracts exactly because the affected output keys are recomputed from
  * materialized state (and deleted when they produce no rows).
  *
  * Input stream schema: `table` STRING, `value` STRING (raw envelope
  * JSON), `seq` LONG (total order; Kafka offset in production).
  */
final class CdcPipeline(
    spark: SparkSession,
    sources: Seq[TableSpec],
    stateDir: String,
    sink: UpsertSink,
    views: Seq[ViewDef],
    stateBuckets: Int = 32) {

  private val byName = sources.map(s => s.name -> s).toMap
  private val states: Map[String, ParquetKeyedTable] =
    sources.map(s => s.name ->
      new ParquetKeyedTable(spark, s"$stateDir/${s.name}",
        numBuckets = stateBuckets)).toMap

  /** Materialized-state schema: leading key + the row columns. */
  private def stateSchema(table: String): StructType =
    StructType(StructField("key", StringType) +:
      byName(table).schema.fields)

  /** Snapshot of a source's materialized dynamic table. */
  def state(table: String): DataFrame =
    states(table).snapshot(stateSchema(table))

  /** Bucket-pruned keyed lookup into a source's materialized state —
    * the read path external consumers (e.g. [[StreamingAnn.search]])
    * should use instead of filtering [[state]]: cost tracks the key set,
    * not the state size. */
  def stateRows(table: String, keys: DataFrame): DataFrame =
    states(table).rowsForKeys(stateSchema(table), keys)

  private def emptyChangelog(table: String): DataFrame = {
    val spec = byName(table)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("key", StringType),
        StructField("op", StringType),
        StructField("before", spec.schema),
        StructField("after", spec.schema),
        StructField("ts_ms", org.apache.spark.sql.types.LongType),
        StructField("seq", org.apache.spark.sql.types.LongType))))
  }

  /** Process one micro-batch (also callable directly for deterministic
    * tests — foreachBatch calls exactly this, with its batchId).
    *
    * Exactly-once across the pipeline's stores WITHOUT a cross-store
    * atomic commit: every store commit records `batchId`
    * ([[ParquetKeyedTable.merge]]); pre-batch reads pin
    * `versionBefore(batchId)` so a REPLAYED batch — redelivered after a
    * crash that committed some stores but not others — recomputes the
    * exact same deltas against the exact same pre-state, already-committed
    * stores skip (idempotent-by-id) and missed stores converge. Sink
    * writes are deterministic functions of those pinned reads, so
    * re-upserting them is value-idempotent. */
  def processBatch(batch: DataFrame, batchId: Option[Long] = None): Unit = {
    // 1. decode + normalize per table (format from the spec options:
    //    MySQL struct envelopes by default, Mongo JSON-string envelopes
    //    for 'debezium-mongo' sources); cached with lineage KEPT
    //    (persist, not localCheckpoint): each frame is read for the state
    //    merge AND by every view, and on a cluster a lost executor must
    //    recompute the decode from the batch, not fail the query
    val changelogs: Map[String, DataFrame] = sources.map { spec =>
      // a spec declared with a catalog-qualified Flink name keeps the
      // original as `qualified-name` metadata (Engine.createTable);
      // envelopes may label the table either way — Debezium topics are
      // typically db-qualified — so route on both
      val labels = spec.name +: spec.options.get("qualified-name").toSeq
      val raw = batch.filter(col("table").isin(labels: _*))
      val normalized =
        if (spec.options.get("format").contains("debezium-mongo"))
          Debezium.normalizeMongo(raw.withColumn("env",
            Debezium.decode(col("value"), Debezium.mongoEnvelope,
              tolerant = false)))
        else
          Debezium.normalize(raw.withColumn("env",
            Debezium.decode(col("value"),
              Debezium.mysqlEnvelope(spec.schema))), spec.primaryKey)
      spec.name -> normalized.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }.toMap

    // 2. pre-merge snapshots stay valid (immutable version dirs) while the
    //    merge commits the next version — pinned by VERSION, so pruned
    //    lookups made after the merge still read pre-merge state; on a
    //    batch REPLAY, versionBefore un-pins any table that already
    //    committed this batch back to its pre-batch version
    val pre = new StateAccess(states, stateSchema,
      sources.map { s =>
        s.name -> (batchId match {
          case Some(id) => states(s.name).versionBefore(id)
          case None     => states(s.name).version
        })
      }.toMap)

    // skip untouched tables entirely: a merge is a full state rewrite
    // (write amplification) and every view would still re-derive from the
    // unchanged snapshot — checkpointed frames make isEmpty a cheap check
    changelogs.foreach { case (table, changelog) =>
      if (!changelog.isEmpty) {
        val compacted = Materializer.compact(changelog)
        val upserts = compacted.filter(col("op") =!= "d")
          .select(col("key") +: byName(table).schema.fieldNames.map(f =>
            col(s"after.$f").as(f)): _*)
        val deletes = compacted.filter(col("op") === "d").select("key")
        states(table).merge(upserts, deletes, batchId)
      }
    }

    val post = new StateAccess(states, stateSchema,
      sources.map(s => s.name -> states(s.name).version).toMap)

    // 3. maintain each view over affected keys
    val ctx = new BatchCtx(batchId)
    try views.foreach { view =>
      val (upserts, deletes) = view.maintain(pre, post, changelogs, ctx)
      sink.upsert(view.sinkIndex, upserts)
      sink.delete(view.sinkIndex, deletes)
    } finally {
      // batch-scoped caches released once every sink write consumed them
      ctx.close()
      changelogs.values.foreach(_.unpersist())
    }
  }

  /** Attach to a streaming DataFrame (kafka / MemoryStream / file) with
    * columns (table, value, seq) and run continuously. */
  def start(stream: DataFrame, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, Some(id)))
      .start()
}
