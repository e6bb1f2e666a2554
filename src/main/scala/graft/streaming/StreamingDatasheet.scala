package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** The corpus DATASHEET (batch q120) continuously maintained — the
  * one-row release summary kept current as the corpus streams: document
  * and token counts, vocabulary size, exact- and near-duplication
  * rates, decimal-ledger mean quality and language entropy, equal after
  * every micro-batch to the batch query over the materialized state.
  *
  * Each number is maintained by the cheapest machinery that keeps it
  * EXACT under ±:
  *  - doc/token counts and the quality sum live in one running-counter
  *    row; quality enters as INTEGER micro-units (round(q·1e6)), the
  *    [[StreamingClusterMonitor]] ledger — integer-valued doubles add
  *    exactly, so retraction restores the sum bit-for-bit;
  *  - vocabulary size integrates the zero-crossings of the shared token
  *    counters ([[StreamingVocabCoverage.maintainTokenCounters]]);
  *  - distinct-text count integrates fingerprint-group births and
  *    deaths from [[StreamingExactDedup.maintainFpState]]'s touched
  *    groups;
  *  - language counts are a bounded per-lang counter table, re-read
  *    whole at emit (language set ≈ dozens — driver-metadata-sized);
  *  - the near-dup doc count is the one honest per-batch seam: it reads
  *    the post-batch label table from
  *    [[StreamingCuration.maintainClusterState]] — duplicate-density-
  *    sized, the same re-contraction cost the curation view already
  *    pays, never corpus-sized.
  *
  * All merges carry the batchId → replay-idempotent; the spec pins the
  * sink row == batch q120 recompute after every micro-batch. */
object StreamingDatasheet {

  private def statsSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("n_docs", LongType),
    StructField("n_tokens", LongType),
    StructField("q_mu", DoubleType),     // integer-valued micro-units
    StructField("n_vocab", LongType),
    StructField("n_texts", LongType)))

  private def langSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("cnt", LongType)))

  def datasheetView(
      spark: SparkSession, stateDir: String,
      name: String = "corpus_datasheet", table: String = "documents",
      textCol: String = "text", langCol: String = "lang",
      threshold: Double = 0.8, bandRows: Int = 2, nBands: Int = 32,
      shingleN: Int = 3, buckets: Int = 32): ViewDef = {
    val statsTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-stats", "key", buckets)
    val cntTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-cnt", "key", buckets)
    val fpTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-fps", "key", buckets)
    val langTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-lang", "key", buckets)
    val sigTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-sigs", "key", buckets)
    val bucketTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-buckets", "key", buckets)
    val pairTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-pairs", "key", buckets)
    val labelTable =
      new ParquetKeyedTable(spark, s"$stateDir/$name-labels", "key", buckets)

    ViewDef(name, (pre, post, batch, ctx) => {
      import spark.implicits._
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      def pin(t: ParquetKeyedTable): Option[Int] = ctx.batchId match {
        case Some(id) => t.versionBefore(id)
        case None     => t.version
      }
      val touched = batch(table).select("key").distinct().persist(mem)
      ctx.defer(touched.unpersist())
      val preRows = pre.rows(table, touched).persist(mem)
      ctx.defer(preRows.unpersist())
      val postRows = post.rows(table, touched).persist(mem)
      ctx.defer(postRows.unpersist())

      // per-row contributions: docs, tokens, quality micro-units
      def contrib(rows: DataFrame, sign: Int): DataFrame = rows.select(
        lit(sign.toLong).as("d_docs"),
        (size(split(trim(col(textCol)), "\\s+")).cast("long") * sign)
          .as("d_tokens"),
        (round(TextAnalysis.qualityScore(col(textCol)) * 1e6, 0) * sign)
          .as("d_qmu"))
      val deltas = contrib(postRows, 1).unionByName(contrib(preRows, -1))
        .agg(coalesce(sum("d_docs"), lit(0L)).as("d_docs"),
          coalesce(sum("d_tokens"), lit(0L)).as("d_tokens"),
          coalesce(sum("d_qmu"), lit(0.0)).as("d_qmu"))
        .head()

      // vocabulary delta: token-counter zero-crossings
      def toks(rows: DataFrame): DataFrame = rows
        .select(col("key").as("doc"),
          explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      val cNew = StreamingVocabCoverage.maintainTokenCounters(
        cntTable, pin(cntTable), toks(preRows), toks(postRows), ctx)
      val vocabDelta = cNew.agg(
        coalesce(sum(when(col("old_cnt") <= 0 && col("new_cnt") > 0, 1L)
          .when(col("old_cnt") > 0 && col("new_cnt") <= 0, -1L)
          .otherwise(0L)), lit(0L))).head().getLong(0)

      // distinct-text delta: fingerprint-group births − deaths among
      // the touched groups (untouched groups cannot change existence)
      val fs = StreamingExactDedup.maintainFpState(
        fpTable, pre, post, touched, ctx, table, textCol)
      val textsDelta =
        fs.postMembers.select("fp").distinct().count() -
          fs.preMembers.select("fp").distinct().count()

      // language counters ±
      val preLV = pin(langTable)
      val langDeltas = postRows.select(col(langCol).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("post_n"))
        .join(preRows.select(col(langCol).as("lang"))
          .groupBy("lang").agg(count(lit(1)).as("pre_n")),
          Seq("lang"), "full_outer")
        .select(col("lang"),
          (coalesce(col("post_n"), lit(0L)) - coalesce(col("pre_n"), lit(0L)))
            .as("delta"))
        .filter(col("delta") =!= 0)
      val lOld = langTable.rowsForKeysAt(preLV, langSchema,
        langDeltas.select(col("lang").as("key")))
      val lNew = langDeltas
        .join(lOld.withColumnRenamed("key", "lang"), Seq("lang"), "left")
        .select(col("lang"),
          (coalesce(col("cnt"), lit(0L)) + col("delta")).as("new_cnt"))
      langTable.merge(
        lNew.filter(col("new_cnt") > 0)
          .select(col("lang").as("key"), col("new_cnt").as("cnt")),
        lNew.filter(col("new_cnt") <= 0).select(col("lang").as("key")),
        ctx.batchId)

      // near-dup pair/label maintenance — the duplicate-density seam
      val cs = StreamingCuration.maintainClusterState(
        sigTable, bucketTable, pairTable, labelTable, post, batch, ctx,
        table, textCol, threshold, bandRows, nBands, shingleN)
      val nNearDocs = cs.newLabels.count()

      // running-counter transition
      val preSV = pin(statsTable)
      val old = statsTable
        .rowsForKeysAt(preSV, statsSchema, Seq("all").toDF("key"))
        .collect().headOption
      val nDocs = old.map(_.getLong(1)).getOrElse(0L) + deltas.getLong(0)
      val nTokens = old.map(_.getLong(2)).getOrElse(0L) + deltas.getLong(1)
      val qMu = old.map(_.getDouble(3)).getOrElse(0.0) + deltas.getDouble(2)
      val nVocab = old.map(_.getLong(4)).getOrElse(0L) + vocabDelta
      val nTexts = old.map(_.getLong(5)).getOrElse(0L) + textsDelta
      statsTable.merge(
        Seq(("all", nDocs, nTokens, qMu, nVocab, nTexts))
          .toDF("key", "n_docs", "n_tokens", "q_mu", "n_vocab", "n_texts"),
        if (nDocs > 0) Seq.empty[String].toDF("key")
        else Seq("all").toDF("key"),
        ctx.batchId)

      if (nDocs <= 0) {
        // empty corpus: the datasheet row retracts (rates are undefined)
        (Seq.empty[String].toDF("id"), Seq("datasheet").toDF("id"))
      } else {
        // entropy over the bounded post-merge language table (identical
        // on replay — merge skipped, version already post-batch)
        val langEnt = langTable.snapshot(langSchema)
          .select(round(-(col("cnt") * 1.0 / nDocs) *
              log(col("cnt") * 1.0 / nDocs), 9)
            .cast("decimal(18,9)").as("term"))
          .agg(round(sum("term").cast("double"), 6))
          .head().getDouble(0)
        def r6(x: Double): Double = new java.math.BigDecimal(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        val upserts = Seq((
          "datasheet", nDocs, nTokens, nVocab, nTexts,
          r6((nDocs - nTexts).toDouble / nDocs),
          r6(nNearDocs.toDouble / nDocs),
          r6(qMu / 1e6 / nDocs),
          langEnt))
          .toDF("id", "n_docs", "n_tokens", "n_vocab", "n_distinct_texts",
            "exact_dup_rate", "neardup_doc_rate", "mean_quality",
            "lang_entropy")
        (upserts, Seq.empty[String].toDF("id"))
      }
    })
  }
}
