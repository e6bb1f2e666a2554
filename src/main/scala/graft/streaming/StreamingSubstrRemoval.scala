package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental ExactSubstr span removal over a GROWING corpus — the
  * streaming form of batch q122 (Lee et al. 2022 window cut via
  * [[graft.functions.CharWindowGrams]]). The sink holds, at every
  * instant, one row per live document with its cleaned text (every
  * character covered by a 50-char window whose text CURRENTLY occurs at
  * ≥ 2 positions corpus-wide removed) — identical to what batch q122
  * computes over the materialized corpus.
  *
  * The retraction hazard is the dup-status flip: a window's "occurs
  * ≥ 2×" verdict is a CORPUS statistic, so a batch document introducing
  * the second occurrence of a window UN-COVERS nothing but COVERS a span
  * inside an UNTOUCHED resident — and a delete dropping the count back
  * to 1 must RESTORE the resident's cut span. The saving fact mirrors
  * [[StreamingWinnow]]'s df cap: the total occurrence count of a window
  * can change only when some batch doc enters or leaves its posting, so
  * every flip-capable window is an affected key of the batch, and the
  * complete re-emit set is
  *
  *   R = batch docs ∪ (pre ∪ post) members of every posting whose
  *       dup status (total ≥ 2) actually FLIPPED
  *
  * — an untouched doc's cut depends only on its OWN windows' dup
  * status, so members of affected-but-unflipped postings are skipped
  * entirely (their cleaned text cannot have changed). Re-emitting a doc
  * recomputes its windows from its own text, prunes the posting lookup
  * to those windows, and reruns the exact q122 interval fold
  * ([[graft.operators.Dedup.removeCovered]] — one code path with batch).
  *
  * Postings store per-member occurrence COUNTS (a window twice inside
  * one doc is already duplicated — multiplicity matters, membership
  * alone is not enough), keyed by the window text with exact members —
  * the [[StreamingContainment]] full-postings precedent. Per-batch cost:
  * O(batch windows + affected-posting members + R's windows); nothing
  * scans or re-windows the resident corpus.
  */
object StreamingSubstrRemoval {

  private def postSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("members", ArrayType(StructType(Seq(
      StructField("m", StringType), StructField("c", LongType)))))))

  /** Continuous span-removal view over a CDC `documents`-shaped source.
    * Sink documents: (id = doc key, cleaned, n_removed). */
  def substrRemovalView(
      spark: SparkSession, stateDir: String,
      name: String = "substr_removal", table: String = "documents",
      textCol: String = "text", n: Int = 50,
      buckets: Int = 32): ViewDef = {
    val postings =
      new ParquetKeyedTable(spark, s"$stateDir/$name-post", "key", buckets)

    ViewDef(name, (pre, post, batch, ctx) => {
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val preV = ctx.batchId match {
        case Some(id) => postings.versionBefore(id)
        case None     => postings.version
      }

      val touched = batch(table).select("key").distinct().persist(mem)
      ctx.defer(touched.unpersist())

      def wins(rows: DataFrame): DataFrame = rows
        .select(col("key").as("doc_id"),
          posexplode(graft.functions.NGrams.charWindowGrams(col(textCol), n))
            .as(Seq("i", "g")))

      def occ(rows: DataFrame): DataFrame = wins(rows)
        .groupBy("g", "doc_id").agg(count(lit(1)).as("c"))

      val oldOcc = occ(pre.rows(table, touched)).persist(mem)
      ctx.defer(oldOcc.unpersist())
      val newOcc = occ(post.rows(table, touched)).persist(mem)
      ctx.defer(newOcc.unpersist())

      val affected = oldOcc.select("g").union(newOcc.select("g"))
        .distinct().withColumnRenamed("g", "key").persist(mem)
      ctx.defer(affected.unpersist())
      val preMembers = postings.rowsForKeysAt(preV, postSchema, affected)
        .select(col("key").as("g"), explode(col("members")).as("mc"))
        .select(col("g"), col("mc.m").as("member"), col("mc.c").as("c"))
        .persist(mem)
      ctx.defer(preMembers.unpersist())

      // postings update: batch docs leave their old (member, count)
      // entries, enter with their new per-doc occurrence counts
      val postMembers = preMembers.join(
          touched.withColumnRenamed("key", "member"), Seq("member"),
          "left_anti")
        .unionByName(newOcc.select(col("g"), col("doc_id").as("member"),
          col("c")))
        .persist(mem)
      ctx.defer(postMembers.unpersist())
      val rows = postMembers.groupBy("g")
        .agg(collect_list(struct(col("member").as("m"), col("c")))
          .as("members"))
        .select(col("g").as("key"), col("members"))
      val emptied = affected.join(rows.select("key"), Seq("key"), "left_anti")
      postings.merge(rows, emptied, ctx.batchId)

      // dup status (Σ occurrence counts ≥ 2) flips only on affected
      // postings; only flipped postings can change an untouched doc's cut
      val preTot = preMembers.groupBy("g").agg(sum("c").as("t0"))
      val postTot = postMembers.groupBy("g").agg(sum("c").as("t1"))
      val flipped = preTot.join(postTot, Seq("g"), "full")
        .filter((coalesce(col("t0"), lit(0L)) >= 2) =!=
          (coalesce(col("t1"), lit(0L)) >= 2))
        .select("g").persist(mem)
      ctx.defer(flipped.unpersist())

      val rescore = touched
        .union(flipped.join(preMembers, "g").select(col("member").as("key")))
        .union(flipped.join(postMembers, "g").select(col("member").as("key")))
        .distinct().persist(mem)
      ctx.defer(rescore.unpersist())

      // exact q122 rows for the re-emit docs at post state: windows from
      // the doc's own text, posting totals pruned to those windows, the
      // shared interval fold for the cut
      val docRows = post.rows(table, rescore)
        .select(col("key"), col(textCol)).persist(mem)
      ctx.defer(docRows.unpersist())
      val rw = wins(docRows).persist(mem)
      ctx.defer(rw.unpersist())
      val dupNow = postings
        .rowsForKeys(postSchema, rw.select(col("g").as("key")).distinct())
        .select(col("key").as("g"), explode(col("members")).as("mc"))
        .groupBy("g").agg(sum("mc.c").as("t"))
        .filter(col("t") >= 2)
        .select("g")
      val starts = rw.join(dupNow, "g")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("i"))).as("starts"))
      val cleaned =
        graft.operators.Dedup.removeCovered(col(textCol), col("starts"), n)
      val upserts = docRows
        .join(starts, col("key") === col("doc_id"), "left")
        .select(col("key").as("id"), cleaned.as("cleaned"),
          (length(col(textCol)) - length(cleaned)).cast("long")
            .as("n_removed"))
      val deletes = rescore.select(col("key").as("id"))
        .join(upserts.select("id"), Seq("id"), "left_anti")
      (upserts, deletes)
    })
  }
}
