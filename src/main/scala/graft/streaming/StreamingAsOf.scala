package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.AsOf

/** The as-of join (q45) as a continuously-maintained attribution view:
  * the sink holds, for every CURRENT left-side event ("purchase"), the
  * same-key right-side event ("click") with the greatest ts ≤ its ts —
  * exactly what batch [[AsOf.asofBackward]] computes over the current
  * state. The hard part a batch join never faces: a LATE right-side
  * event must re-attribute already-emitted left rows, a right-side
  * delete must revert them, and a left-side update/delete must move or
  * retract its own attribution.
  *
  * Per micro-batch:
  *
  *   1. a per-key secondary projection (one bucketed [[ParquetKeyedTable]]
  *      row per join key holding that key's live events) is read for
  *      exactly the touched keys, batch events replace their old
  *      versions, and the updated rows merge back — the same
  *      read-modify-write pattern as [[IncrementalAgg.productStats]]'s
  *      items-by-order index,
  *   2. attribution recomputes ONLY for the touched keys' events, by
  *      running the SAME carry-forward window operator the batch query
  *      uses over those keys' rows — incremental and batch can't drift,
  *   3. left events that disappeared (delete, or type change) retract.
  *
  * 100 TB posture: per-batch work is O(touched keys' events) via
  * bucket-pruned lookups; nothing scans resident state. A key's row
  * grows with ITS OWN event count — the same boundedness assumption any
  * per-key stream join makes. Commits carry the batchId → replay-safe.
  */
object StreamingAsOf {

  private def idxSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("events", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("ts", LongType),
      StructField("typ", StringType)))))))

  /** Continuous as-of attribution over a CDC `events`-shaped source
    * (primary-keyed; `keyCol` is the join key, `tsCol` a LONG event
    * time). Sink documents: (id = left event id, <keyCol>, ts,
    * attributed right id + ts, nulls when nothing precedes). */
  def attributionView(
      spark: SparkSession, stateDir: String,
      name: String = "purchase_attribution", table: String = "events",
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", leftType: String = "purchase",
      rightType: String = "click", buckets: Int = 32): ViewDef = {
    val byKey =
      new ParquetKeyedTable(spark, s"$stateDir/$name-by-key", "key", buckets)

    ViewDef(name, (pre, post, batch, ctx) => {
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val preIdxV = ctx.batchId match {
        case Some(id) => byKey.versionBefore(id)
        case None     => byKey.version
      }

      val touched = batch(table).select("key").distinct().persist(mem)
      ctx.defer(touched.unpersist())
      val preRows = pre.rows(table, touched)
        .select(col("key"), col(keyCol), col(tsCol), col(typeCol))
        .persist(mem)
      ctx.defer(preRows.unpersist())
      val postRows = post.rows(table, touched)
        .select(col("key"), col(keyCol), col(tsCol), col(typeCol))
        .persist(mem)
      ctx.defer(postRows.unpersist())

      // 1. read-modify-write the per-key projection for touched keys:
      // resident events of those keys minus the touched event ids, plus
      // the touched events' post images
      val touchedKeys = preRows.select(col(keyCol))
        .union(postRows.select(col(keyCol)))
        .distinct().filter(col(keyCol).isNotNull)
        .select(col(keyCol).cast("string").as("key")).persist(mem)
      ctx.defer(touchedKeys.unpersist())

      val resident = byKey.rowsForKeysAt(preIdxV, idxSchema, touchedKeys)
        .select(col("key"), explode(col("events")).as("e"))
        .select(col("key"), col("e.id"), col("e.ts"), col("e.typ"))
        .join(touched.withColumnRenamed("key", "id"), Seq("id"), "left_anti")
      val fresh = postRows
        .filter(col(typeCol).isin(leftType, rightType))
        .select(col(keyCol).cast("string").as("key"),
          col("key").as("id"), col(tsCol).cast("long").as("ts"),
          col(typeCol).as("typ"))
      val allEvents = resident.unionByName(fresh).persist(mem)
      ctx.defer(allEvents.unpersist())

      val idxRows = allEvents.groupBy("key")
        .agg(collect_list(struct(col("id"), col("ts"), col("typ")))
          .as("events"))
      val emptiedKeys = touchedKeys
        .join(idxRows.select("key"), Seq("key"), "left_anti")
      byKey.merge(idxRows, emptiedKeys, ctx.batchId)

      // 2. re-attribute every left event of the touched keys with the
      // SAME operator the batch query uses
      val lefts = allEvents.filter(col("typ") === leftType)
        .select(col("key").as("jk"), col("id").as("left_id"), col("ts"))
      val rights = allEvents.filter(col("typ") === rightType)
        .select(col("key").as("jk"), col("id"), col("ts"))
      val attributed = AsOf.asofBackward(lefts, rights, Seq("jk"),
        "ts", "ts", Seq("id" -> "right_id", "ts" -> "right_ts"))
      val upserts = attributed.select(
        col("left_id").as("id"), col("jk").as(keyCol), col("ts"),
        col("right_id"), col("right_ts"))

      // 3. left events that stopped being left events retract
      val deletes = preRows.filter(col(typeCol) === leftType).select("key")
        .join(postRows.filter(col(typeCol) === leftType).select("key"),
          Seq("key"), "left_anti")
        .select(col("key").as("id"))
      (upserts, deletes)
    })
  }
}
