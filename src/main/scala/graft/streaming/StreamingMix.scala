package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Curation

/** Continuously-maintained temperature-scaled mixture table — the
  * streaming form of batch q132: the sink always holds, per live
  * source, the natural token count, the α=0.5 sampling weight and the
  * implied epoch multiplier. Token counts per source are ± counters
  * (the [[IncrementalAgg]] discipline: post-image tokens add,
  * pre-image tokens subtract), so deletes and re-texted updates retract
  * exactly. One source's change moves EVERY source's weight (the
  * denominator is global), so each batch re-emits the whole table —
  * honest and cheap: the table is |sources|-bounded, and the arithmetic
  * is the SAME [[Curation.alphaMix]] fold the batch query runs (one
  * code path, pinned once).
  *
  * At 100 TB: per batch, O(|batch| tokens) narrow delta work + a
  * |sources|-row state read — the continuously-correct sampling-weight
  * table a training-data loader polls, maintained at ingest cost. */
object StreamingMix {

  private val stateSchema = StructType(Seq(
    StructField("key", StringType), StructField("n_tokens", LongType)))

  private def tokenCounts(rows: DataFrame, textCol: String,
      sign: Int): DataFrame =
    rows.groupBy(col("source"))
      .agg((sum(size(split(trim(col(textCol)), "\\s+")).cast("long")) * sign)
        .as("d"))

  /** Sink documents: (id = source, n_tokens, weight, epochs); a source
    * whose last document leaves retracts its sink row (and the other
    * rows re-weight). */
  def mixView(spark: SparkSession, stateDir: String,
      table: String = "documents", textCol: String = "text"): ViewDef = {
    val state = new ParquetKeyedTable(
      spark, s"$stateDir/mix-state", "key", 8)
    ViewDef("temperature_mix", (pre, post, batch, ctx) => {
      val touched = batch(table).select("key").distinct()
      val delta = tokenCounts(post.rows(table, touched), textCol, 1)
        .unionAll(tokenCounts(pre.rows(table, touched), textCol, -1))
        .groupBy("source").agg(sum("d").as("d"))
        .filter(col("d") =!= 0)
        .select(col("source").as("key"), col("d"))
      val preV = ctx.batchId match {
        case Some(id) => state.versionBefore(id)
        case None     => state.version
      }
      val old = state.rowsForKeysAt(preV, stateSchema, delta.select("key"))
        .select(col("key"), col("n_tokens").as("o_n"))
      val merged = delta.join(old, Seq("key"), "left")
        .select(col("key"),
          (coalesce(col("o_n"), lit(0L)) + col("d")).as("n_tokens"))
      state.merge(merged.filter(col("n_tokens") =!= 0),
        merged.filter(col("n_tokens") === 0).select("key"), ctx.batchId)
      // the denominator is global → re-emit the whole (bounded) table
      val live = state.snapshot(stateSchema)
        .select(col("key").as("source"), col("n_tokens"))
      val upserts = Curation.alphaMix(live)
        .select(col("source").as("id"), col("n_tokens"),
          col("weight"), col("epochs"))
      val deletes = merged.filter(col("n_tokens") === 0)
        .select(col("key").as("id"))
      (upserts, deletes)
    })
  }
}
