package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Temporal

/** SCD2 versioned-dimension maintenance — the continuous form of batch
  * q158: the sink holds one document per (entity, version) with
  * [valid_from, valid_to) event-time intervals and an is_current flag,
  * kept exact under CDC inserts, updates, OUT-OF-ORDER arrivals and
  * deletes. This is precisely the table Flink's temporal-table join
  * reads; the reference materializes only its latest-row projection
  * (the ES upsert sinks, flink-ddl.sql:96-109).
  *
  * The cases a batch build never faces, all handled by per-user rebuild:
  *  - a LATE event (ts before existing rows) renumbers every later
  *    version and re-points the neighbor's valid_to;
  *  - deleting a middle event re-glues the adjacent intervals
  *    [a,b) + [b,c) → [a,c) and shrinks the version count — the stale
  *    highest version numbers retract from the sink;
  *  - an entity losing its last event retracts its whole history.
  *
  * Per micro-batch (the [[StreamingAsOf]] rails):
  *   1. read-modify-write a per-user secondary projection (one bucketed
  *      [[ParquetKeyedTable]] row per user holding that user's live
  *      events) for exactly the touched users,
  *   2. rebuild those users' history rows by running the SAME
  *      [[Temporal.scd2Intervals]] operator the batch query uses —
  *      incremental and batch cannot drift,
  *   3. retract versions beyond the rebuilt count (pre-index length vs
  *      post-index length; an emptied user retracts 1..n_old).
  *
  * 100 TB posture: per-batch work is O(touched users' events) via
  * bucket-pruned lookups; nothing scans resident state. A user's index
  * row grows with its OWN change count — the same boundedness assumption
  * the batch window makes per partition key. Note the tie-break inside
  * one timestamp is the CDC key's STRING order here (the key is a
  * string in flight); the spec's batch recompute uses the same column,
  * so the contract is explicit.
  */
object StreamingScd2 {

  private def idxSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("events", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("ts", LongType),
      StructField("typ", StringType),
      StructField("value", DoubleType)))))))

  /** Continuous SCD2 history over a CDC `events`-shaped source
    * (primary-keyed; `userCol` is the entity key, `tsCol` a LONG event
    * time). Sink documents: id = "user:version", with (user, version,
    * event_id, event_type, value, valid_from, valid_to NULL-for-current,
    * is_current). */
  def scd2View(
      spark: SparkSession, stateDir: String,
      name: String = "scd2_history", table: String = "events",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      buckets: Int = 32): ViewDef = {
    val byUser =
      new ParquetKeyedTable(spark, s"$stateDir/$name-by-user", "key", buckets)

    ViewDef(name, (pre, post, batch, ctx) => {
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val preIdxV = ctx.batchId match {
        case Some(id) => byUser.versionBefore(id)
        case None     => byUser.version
      }

      val touched = batch(table).select("key").distinct().persist(mem)
      ctx.defer(touched.unpersist())
      val preRows = pre.rows(table, touched)
        .select(col("key"), col(userCol), col(tsCol), col(typeCol),
          col(valueCol))
        .persist(mem)
      ctx.defer(preRows.unpersist())
      val postRows = post.rows(table, touched)
        .select(col("key"), col(userCol), col(tsCol), col(typeCol),
          col(valueCol))
        .persist(mem)
      ctx.defer(postRows.unpersist())

      val touchedUsers = preRows.select(col(userCol))
        .union(postRows.select(col(userCol)))
        .distinct().filter(col(userCol).isNotNull)
        .select(col(userCol).cast("string").as("key")).persist(mem)
      ctx.defer(touchedUsers.unpersist())

      // pre-batch history length per touched user — versions beyond the
      // rebuilt count retract below
      val preIdx = byUser.rowsForKeysAt(preIdxV, idxSchema, touchedUsers)
        .persist(mem)
      ctx.defer(preIdx.unpersist())
      val oldCounts = preIdx.select(col("key"),
        size(col("events")).cast("long").as("n_old"))

      // 1. read-modify-write the per-user projection for touched users
      val resident = preIdx
        .select(col("key"), explode(col("events")).as("e"))
        .select(col("key"), col("e.id"), col("e.ts"), col("e.typ"),
          col("e.value"))
        .join(touched.withColumnRenamed("key", "id"), Seq("id"), "left_anti")
      val fresh = postRows.select(
        col(userCol).cast("string").as("key"), col("key").as("id"),
        col(tsCol).cast("long").as("ts"), col(typeCol).as("typ"),
        col(valueCol).cast("double").as("value"))
      val allEvents = resident.unionByName(fresh).persist(mem)
      ctx.defer(allEvents.unpersist())

      val idxRows = allEvents.groupBy("key")
        .agg(collect_list(
          struct(col("id"), col("ts"), col("typ"), col("value")))
          .as("events"))
      val emptiedUsers = touchedUsers
        .join(idxRows.select("key"), Seq("key"), "left_anti")
      byUser.merge(idxRows, emptiedUsers, ctx.batchId)

      // 2. rebuild the touched users' history with the SAME operator
      // batch q158 uses
      val rebuilt = Temporal.scd2Intervals(
        allEvents.select(col("key").as("user"), col("id").as("event_id"),
          col("ts"), col("typ"), col("value")),
        userCol = "user", tsNsCol = "ts", idCol = "event_id")
      val upserts = rebuilt.select(
        concat(col("user"), lit(":"), col("version")).as("id"),
        col("user").as(userCol), col("version"), col("event_id"),
        col("typ").as(typeCol), col("value"),
        col("valid_from_ns").as("valid_from"),
        col("valid_to_ns").as("valid_to"), col("is_current"))

      // 3. stale version numbers retract (n_new < v <= n_old; an
      // emptied user has no idxRows row → n_new = 0 retracts them all)
      val newCounts = idxRows.select(col("key"),
        size(col("events")).cast("long").as("n_new"))
      val deletes = oldCounts
        .join(newCounts, Seq("key"), "left")
        .select(col("key"), col("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .filter(col("n_old") > col("n_new"))
        .select(col("key"),
          explode(sequence(col("n_new") + 1, col("n_old"))).as("v"))
        .select(concat(col("key"), lit(":"), col("v")).as("id"))
      (upserts, deletes)
    })
  }
}
