package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Streaming held-out bigram language model — q88's add-one-smoothed
  * quality LM kept continuously current over a CDC `documents` source,
  * the model-side sibling of [[StreamingBm25]]: the training counts are
  * maintained ± per micro-batch, and SCORING is priced at read time
  * ([[score]]), because a count drift changes every resident document's
  * perplexity — materializing per-doc scores would mean rescoring the
  * corpus on every write, the exact thing the BM25 view's idf-at-read
  * design avoids.
  *
  * Model state (all running counters — reads pin the pre-batch version,
  * merges carry the batchId, the [[IncrementalAgg]] replay discipline):
  *   - c2: bigram → count over the heuristic-high-quality subset
  *     (gram-keyed, the batch aggregate's shape),
  *   - c1: left-context → Σ c2 (token-keyed),
  *   - vtok: token → endpoint-occurrence count (membership in the
  *     smoothing vocabulary flips at 0↔1),
  *   - stats: one row holding |V| — maintained by vtok flips so a read
  *     never counts the vocabulary table.
  *
  * A document contributes iff ITS OWN text passes the quality gate
  * (hi = quality ≥ 0.5 — a pure function of the row), so an update can
  * move a doc in or out of the training subset and the ± contributions
  * follow from the pre/post images alone. Per-batch cost is O(batch
  * bigrams + affected gram rows); nothing rescans resident documents.
  *
  * Sink documents mirror the changed model rows (observable like every
  * view): one doc per live c2 row (id = "w1|w2", w1, w2, cnt) plus a
  * "corpus|stats" doc with v_count; emptied bigrams are retracted.
  */
object StreamingLm {

  private def c2Schema = StructType(Seq(
    StructField("key", StringType),
    StructField("w1", StringType),
    StructField("w2", StringType),
    StructField("cnt", LongType)))
  private def cntSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("cnt", LongType)))
  private def statsSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("v_count", LongType)))

  private def tables(spark: SparkSession, stateDir: String, name: String,
      buckets: Int) = (
    new ParquetKeyedTable(spark, s"$stateDir/$name-c2", "key", buckets),
    new ParquetKeyedTable(spark, s"$stateDir/$name-c1", "key", buckets),
    new ParquetKeyedTable(spark, s"$stateDir/$name-vtok", "key", buckets),
    new ParquetKeyedTable(spark, s"$stateDir/$name-stats", "key", buckets))

  /** Continuous model-maintenance view. */
  def lmView(
      spark: SparkSession, stateDir: String,
      name: String = "lm_model", table: String = "documents",
      textCol: String = "text", buckets: Int = 32): ViewDef = {
    val (c2Table, c1Table, vTable, statsTable) =
      tables(spark, stateDir, name, buckets)

    ViewDef(name, (pre, post, batch, ctx) => {
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      def pin(t: ParquetKeyedTable): Option[Int] = ctx.batchId match {
        case Some(id) => t.versionBefore(id)
        case None     => t.version
      }
      val touched = batch(table).select("key").distinct().persist(mem)
      ctx.defer(touched.unpersist())

      // signed bigram contributions of one state image's hi docs
      def bigrams(rows: DataFrame, sign: Int): DataFrame = rows
        .filter(TextAnalysis.qualityScore(col(textCol)) >= 0.5)
        .select(col("key"), split(trim(col(textCol)), "\\s+").as("w"))
        .select(col("key"), col("w"),
          posexplode(slice(col("w"), lit(1),
            greatest(size(col("w")) - 1, lit(0)))).as(Seq("p0", "w1")))
        .select(col("w1"), element_at(col("w"), col("p0") + 2).as("w2"),
          lit(sign.toLong).as("d"))

      val biDeltas = bigrams(pre.rows(table, touched), -1)
        .unionByName(bigrams(post.rows(table, touched), 1))
        .groupBy("w1", "w2").agg(sum("d").as("d"))
        .filter(col("d") =!= 0)
        .persist(mem)
      ctx.defer(biDeltas.unpersist())

      /** ± merge of a (key, cnt) running-counter table; returns the
        * merged frame (key, cnt) including zeros for flip detection. */
      def mergeCounts(t: ParquetKeyedTable, deltas: DataFrame): DataFrame = {
        val old = t.rowsForKeysAt(pin(t), cntSchema, deltas.select("key"))
        val merged = deltas.join(old.withColumnRenamed("cnt", "o"),
            Seq("key"), "full_outer")
          .select(col("key"),
            (coalesce(col("o"), lit(0L)) + coalesce(col("d"), lit(0L)))
              .as("cnt"))
          .persist(mem)
        ctx.defer(merged.unpersist())
        t.merge(merged.filter(col("cnt") > 0),
          merged.filter(col("cnt") <= 0).select("key"), ctx.batchId)
        merged
      }

      // c2 (carries w1/w2 for the sink)
      val c2Old = c2Table.rowsForKeysAt(pin(c2Table), c2Schema,
        biDeltas.select(Keys.pair(col("w1"), col("w2")).as("key")))
      val c2Merged = biDeltas
        .select(Keys.pair(col("w1"), col("w2")).as("key"),
          col("w1"), col("w2"), col("d"))
        .join(c2Old.select(col("key"), col("w1").as("ow1"),
          col("w2").as("ow2"), col("cnt").as("o")), Seq("key"), "full_outer")
        .select(col("key"),
          coalesce(col("w1"), col("ow1")).as("w1"),
          coalesce(col("w2"), col("ow2")).as("w2"),
          (coalesce(col("o"), lit(0L)) + coalesce(col("d"), lit(0L)))
            .as("cnt"))
        .persist(mem)
      ctx.defer(c2Merged.unpersist())
      c2Table.merge(
        c2Merged.filter(col("cnt") > 0).select("key", "w1", "w2", "cnt"),
        c2Merged.filter(col("cnt") <= 0).select("key"), ctx.batchId)

      // c1 = Σ c2 by left context
      mergeCounts(c1Table,
        biDeltas.groupBy(col("w1").as("key")).agg(sum("d").as("d")))

      // vocabulary refcounts: each bigram row contributes one endpoint
      // occurrence per side; |V| moves by the membership flips
      val vDeltas = biDeltas
        .select(explode(array(col("w1"), col("w2"))).as("key"), col("d"))
        .groupBy("key").agg(sum("d").as("d"))
      val vMerged = mergeCounts(vTable, vDeltas)
      val flips = vMerged.join(vDeltas, Seq("key"))
        .select(when(col("cnt") > 0 && col("cnt") - col("d") <= 0, 1L)
          .when(col("cnt") <= 0 && col("cnt") - col("d") > 0, -1L)
          .otherwise(0L).as("f"))
        .agg(coalesce(sum("f"), lit(0L)).as("dv"))
      val statsOld = statsTable.rowsForKeysAt(pin(statsTable), statsSchema,
        spark.createDataFrame(Seq(Tuple1("corpus"))).toDF("key"))
      val statsNew = flips.crossJoin(
          statsOld.select(col("v_count").as("ov"))
            .unionByName(spark.createDataFrame(Seq(Tuple1(0L))).toDF("ov"))
            .agg(max("ov").as("ov")))
        .select(lit("corpus").as("key"), (col("ov") + col("dv")).as("v_count"))
        .persist(mem)
      ctx.defer(statsNew.unpersist())
      statsTable.merge(statsNew,
        statsNew.filter(lit(false)).select("key"), ctx.batchId)

      val upserts = c2Merged.filter(col("cnt") > 0)
        .select(col("key").as("id"), col("w1"), col("w2"), col("cnt"))
        .unionByName(statsNew
          .select(lit("corpus|stats").as("id"), lit(null).cast("string").as("w1"),
            lit(null).cast("string").as("w2"), col("v_count").as("cnt")))
      val deletes = c2Merged.filter(col("cnt") <= 0)
        .select(col("key").as("id"))
      (upserts, deletes)
    })
  }

  /** Score a (key, text) document frame against the CURRENT model —
    * identical formula, rounding and DECIMAL discipline to batch q88,
    * so the result equals a batch recompute over the corpus the model
    * has absorbed. Reads c2 rows for the frame's bigrams and c1 rows
    * for its left contexts (bucket-pruned) plus the 1-row |V| — cost
    * tracks the scored frame, never the model or corpus size. Docs with
    * fewer than two tokens are absent, like the batch form. */
  def score(
      spark: SparkSession, stateDir: String, docs: DataFrame,
      name: String = "lm_model", textCol: String = "text",
      buckets: Int = 32): DataFrame = {
    val (c2Table, c1Table, vTable, statsTable) =
      tables(spark, stateDir, name, buckets)

    val bi = docs
      .select(col("key").as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(slice(col("w"), lit(1),
          greatest(size(col("w")) - 1, lit(0)))).as(Seq("p0", "w1")))
      .select(col("doc_id"), col("w1"),
        element_at(col("w"), col("p0") + 2).as("w2"))
    val c2 = c2Table.rowsForKeys(c2Schema,
        bi.select(Keys.pair(col("w1"), col("w2")).as("key")))
      .select(col("w1"), col("w2"), col("cnt").as("c2"))
    val c1 = c1Table.rowsForKeys(cntSchema,
        bi.select(col("w1").as("key")))
      .select(col("key").as("w1"), col("cnt").as("c1"))
    // default |V| = 0 when the model is empty, so an unscorable corpus
    // still yields rows (inf nll) exactly like the batch form's
    // empty-subset aggregate
    val v = statsTable.rowsForKeys(statsSchema,
        spark.createDataFrame(Seq(Tuple1("corpus"))).toDF("key"))
      .select(col("v_count"))
      .unionByName(spark.createDataFrame(Seq(Tuple1(0L))).toDF("v_count"))
      .agg(max("v_count").as("v"))
    bi.join(c2, Seq("w1", "w2"), "left_outer")
      .join(c1, Seq("w1"), "left_outer")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(-log((coalesce(col("c2"), lit(0L)) + 1.0) /
            (coalesce(col("c1"), lit(0L)) + col("v"))), 6)
          .cast("decimal(18,6)").as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum("nll").cast("double") / count(lit(1)), 6).as("avg_nll"))
  }
}
