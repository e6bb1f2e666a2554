package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact retractive token counts over a document changelog — the
  * continuous form of q62's heavy-hitter report, and the exact-count
  * counterpart of [[StreamingCardinality]]'s grow-only sketch: deletes
  * and re-texted updates RETRACT here, so the maintained counts equal a
  * from-scratch count over the corpus's current images at every batch
  * boundary (the spec pins exactly that).
  *
  * State discipline: one bucketed [[ParquetKeyedTable]] keyed by token
  * holding its running count — the same ± ledger as IncrementalAgg, but
  * the "group" is a token produced by EXPLODING the row, so one row
  * transition contributes to many groups. Per batch:
  *
  *   Δ(token) = count in post-images of touched docs
  *            − count in pre-images of touched docs
  *
  * summed map-side per token (the shuffle carries (token, ±n), never
  * text), folded into the touched tokens' state rows via a bucket-pruned
  * read-modify-write; a token whose count reaches 0 is deleted from
  * state and sink. Per-batch cost is O(batch tokens) — corpus size never
  * appears. Commits are idempotent-by-batchId and deltas derive from the
  * pre-version rows, so a redelivered batch converges like every other
  * store in the pipeline.
  *
  * The sink carries every live token's current count (vocabulary-sized,
  * like the BM25 postings index — fine for a sink that is itself a keyed
  * store); the top-k READ prices the ordering at query time via
  * [[TokenCounts.topTokens]], which plans as TakeOrderedAndProject over
  * the state scan — per-partition top-k, the driver never sees the full
  * vocabulary. A read that must avoid the state scan entirely would keep
  * a bounded candidate set (space-saving sketch) next to the exact
  * ledger; at vocabulary scales (≪ corpus scale) the scan is the simpler
  * honest answer.
  */
object StreamingTopTokens {

  private val stateSchema = StructType(Seq(
    StructField("key", StringType), StructField("cnt", LongType)))

  /** Handle exposing the maintained view and its read path. */
  final class TokenCounts(spark: SparkSession, stateDir: String,
      table: String, tokens: Column) {
    private val state = new ParquetKeyedTable(
      spark, s"$stateDir/token_counts-state", "key", 32)

    val view: ViewDef = ViewDef("token_counts", (pre, post, batch, ctx) => {
      val touched = batch(table).select("key").distinct()
      def tokenCounts(rows: DataFrame, sign: Long): DataFrame =
        rows.select(explode(tokens).as("key"))
          .groupBy("key").agg((count(lit(1)) * sign).as("d"))
      val deltas = tokenCounts(post.rows(table, touched), 1L)
        .unionByName(tokenCounts(pre.rows(table, touched), -1L))
        .groupBy("key").agg(sum("d").as("d"))
      val preV = ctx.batchId match {
        case Some(id) => state.versionBefore(id)
        case None     => state.version
      }
      val old = state.rowsForKeysAt(preV, stateSchema, deltas.select("key"))
        .withColumnRenamed("cnt", "o_cnt")
      val merged = deltas.join(old, Seq("key"), "left")
        .select(col("key"),
          (coalesce(col("o_cnt"), lit(0L)) + col("d")).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ctx.defer(merged.unpersist()) // released after the sink consumes
      val live = merged.filter(col("cnt") > 0)
      val dead = merged.filter(col("cnt") <= 0).select("key")
      state.merge(live, dead, ctx.batchId)
      (live.select(col("key").as("id"), col("key").as("token"),
        col("cnt")),
        dead.select(col("key").as("id")))
    })

    /** Current top-k (count DESC, token ASC) — TakeOrderedAndProject
      * over the state scan; matches batch q62's report shape. */
    def topTokens(k: Int): DataFrame =
      state.snapshot(stateSchema)
        .orderBy(col("cnt").desc, col("key"))
        .limit(k)
        .select(col("key").as("token"), col("cnt"))
  }

  /** Token-count view over `table`'s changelog; default tokenization is
    * q62's whitespace split. */
  def tokenCounts(spark: SparkSession, stateDir: String,
      table: String = "documents",
      tokens: Column = split(trim(col("text")), "\\s+")): TokenCounts =
    new TokenCounts(spark, stateDir, table, tokens)
}
