package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Incremental containment-pair detection over a GROWING corpus — the
  * streaming form of batch q83's exact prefix-filter join
  * ([[Dedup.containmentPairs]]), closing the one batch-dedup family
  * member that had no streaming counterpart. The sink index holds, at
  * every instant, exactly the directed pairs with
  * containment(A→B) = |A∩B|/|A| ≥ θ over the CURRENT document state.
  *
  * The batch form orders each document's features by CORPUS document
  * frequency before taking the pigeonhole prefix — a global statistic
  * that drifts as documents arrive, which would dirty every resident
  * prefix on every batch. The pigeonhole recall proof, however, holds
  * for ANY fixed total order (if |A∩B| ≥ ⌈θ|A|⌉ then at most
  * d = |A|−⌈θ|A|⌉ of A's features miss B, so among A's first d+1
  * features under any order one is in B). The incremental form therefore
  * orders by (xxhash64(f), f) — a pure function of the feature — making
  * each document's prefix a function of its OWN text alone: resident
  * prefixes never change, and per-batch work never touches the resident
  * corpus. df-ordering is only the batch form's collision optimization;
  * recall is unaffected, and both forms exact-verify, so their PAIR SETS
  * are identical (pinned by StreamingContainmentSpec).
  *
  * Two posting states (the inverted-index pattern of [[StreamingBm25]]):
  *   - full postings: feature → docs CONTAINING it (candidate partners
  *     for a new doc's prefix — the "new doc as A" direction),
  *   - prefix postings: feature → docs whose PREFIX holds it (partners
  *     whose prefix hits a new doc's features — "new doc as B").
  *
  * Per batch, with B = created/updated/deleted docs: retract via B's OLD
  * features/prefix against pre-state postings (a superset of every pair
  * a previous batch could have emitted with a member of B, minus
  * re-verified pairs = exactly the stale ones); merge B's membership out
  * of old keys and into new ones (bucket-pruned read-modify-write,
  * idempotent-by-batchId); discover candidates in both directions
  * against POST postings (resident and same-batch partners); then the
  * same exact relational verify as batch q83
  * ([[Dedup.verifyContainment]]). Per-batch cost is O(|B| features +
  * posting collisions) — nothing scans or re-prefixes residents.
  */
object StreamingContainment {

  private def postSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("members", ArrayType(StringType))))

  /** The fixed-order pigeonhole prefix of an exploded (doc_id, f) frame:
    * first n − ⌈θn⌉ + 1 features per doc under (xxhash64(f), f). Same
    * ε-guarded integer arithmetic as the batch form
    * (Dedup.containmentPairs): θn is either an integer or ≥ 1/n from
    * one, so 1e-9 cannot cross a rounding boundary. */
  private[streaming] def prefixOf(exploded: DataFrame, theta: Double): DataFrame = {
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n"))
    exploded
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(xxhash64(col("f")), col("f"))))
      .join(sizes, "doc_id")
      .filter(col("rk") <=
        col("n") - ceil(col("n") * theta - lit(1e-9)) + 1)
      .select("doc_id", "f")
  }

  /** Continuous containment-pairs view over a CDC `documents`-shaped
    * source. Sink documents: (id = "a|b", doc_a, doc_b, containment),
    * directed. Defaults match batch q83: word 3-shingles, θ = 0.9. */
  def containmentView(
      spark: SparkSession, stateDir: String,
      name: String = "containment_pairs", table: String = "documents",
      textCol: String = "text", theta: Double = 0.9,
      shingleN: Int = 3, buckets: Int = 32): ViewDef = {
    val fullPost =
      new ParquetKeyedTable(spark, s"$stateDir/$name-full", "key", buckets)
    val prefPost =
      new ParquetKeyedTable(spark, s"$stateDir/$name-prefix", "key", buckets)

    ViewDef(name, (pre, post, batch, ctx) => {
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      def pin(t: ParquetKeyedTable): Option[Int] = ctx.batchId match {
        case Some(id) => t.versionBefore(id)
        case None     => t.version
      }
      val preFullV = pin(fullPost)
      val prefPreV = pin(prefPost)

      val touched = batch(table).select("key").distinct().persist(mem)
      ctx.defer(touched.unpersist())
      val touchedDocs = touched.withColumnRenamed("key", "doc_id")

      def feats(rows: DataFrame): DataFrame = rows
        .select(col("key").as("doc_id"),
          explode(Dedup.shingles(col(textCol), shingleN)).as("f"))

      // old/new feature sets of the batch docs only
      val oldFeats = feats(pre.rows(table, touched)).persist(mem)
      ctx.defer(oldFeats.unpersist())
      val newFeats = feats(post.rows(table, touched)).persist(mem)
      ctx.defer(newFeats.unpersist())
      val oldPrefix = prefixOf(oldFeats, theta)
      val newPrefix = prefixOf(newFeats, theta).persist(mem)
      ctx.defer(newPrefix.unpersist())

      // pre-state postings of every affected key (pruned lookups)
      def members(t: ParquetKeyedTable, v: Option[Int],
          keys: DataFrame): DataFrame =
        t.rowsForKeysAt(v, postSchema, keys)
          .select(col("key").as("f"), explode(col("members")).as("member"))
      val affectedFull = oldFeats.select("f").union(newFeats.select("f"))
        .distinct().withColumnRenamed("f", "key").persist(mem)
      ctx.defer(affectedFull.unpersist())
      val affectedPref = oldPrefix.select("f").union(newPrefix.select("f"))
        .distinct().withColumnRenamed("f", "key").persist(mem)
      ctx.defer(affectedPref.unpersist())
      val preFull = members(fullPost, preFullV, affectedFull).persist(mem)
      ctx.defer(preFull.unpersist())
      // prefix postings are READ over affectedFull, not affectedPref:
      // the as-B directions join a batch doc's WHOLE feature set against
      // resident prefixes, and a resident partner's prefix key need not
      // appear in the batch doc's own prefix — reading only prefix keys
      // missed those partners (discovery) and left their stale pairs
      // unretracted. Membership, by contrast, only changes on the batch
      // docs' own prefix keys, so the MERGE below stays affectedPref-
      // scoped (prePrefNarrow).
      val prePref = members(prefPost, prefPreV, affectedFull).persist(mem)
      ctx.defer(prePref.unpersist())

      // retract superset: pairs any previous batch could have emitted
      // with a batch member on either side
      val oldAsA = oldPrefix.join(preFull, "f")
        .filter(col("member") =!= col("doc_id"))
        .select(col("doc_id").as("doc_a"), col("member").as("doc_b"))
      val oldAsB = oldFeats.join(prePref, "f")
        .filter(col("member") =!= col("doc_id"))
        .select(col("member").as("doc_a"), col("doc_id").as("doc_b"))
      val retractCandidates = oldAsA.union(oldAsB).distinct()

      // posting updates: batch docs leave old keys, enter new ones
      def updatePostings(t: ParquetKeyedTable, preMembers: DataFrame,
          affected: DataFrame, newMemb: DataFrame): DataFrame = {
        val kept = preMembers.join(
          touchedDocs.withColumnRenamed("doc_id", "member"),
          Seq("member"), "left_anti")
        val postMembers = kept.unionByName(
          newMemb.select(col("f"), col("doc_id").as("member")))
          .persist(mem)
        ctx.defer(postMembers.unpersist())
        val rows = postMembers.groupBy("f")
          .agg(collect_list("member").as("members"))
          .select(col("f").as("key"), col("members"))
        val emptied = affected.join(rows.select("key"), Seq("key"), "left_anti")
        t.merge(rows, emptied, ctx.batchId)
        postMembers
      }
      val postFull = updatePostings(fullPost, preFull, affectedFull, newFeats)
      // post-state prefix members over the WIDE read set, computed ONCE:
      // discovery joins against all of it (resident prefix keys outside
      // affectedPref included — see above), while the prefix-table MERGE
      // takes only its affectedPref slice (the only keys whose
      // membership can change)
      val postPref = prePref.join(
          touchedDocs.withColumnRenamed("doc_id", "member"),
          Seq("member"), "left_anti")
        .unionByName(newPrefix.select(col("f"), col("doc_id").as("member")))
        .persist(mem)
      ctx.defer(postPref.unpersist())
      val prefRows = postPref.join(
          affectedPref.withColumnRenamed("key", "f"), Seq("f"), "left_semi")
        .groupBy("f").agg(collect_list("member").as("members"))
        .select(col("f").as("key"), col("members"))
      val prefEmptied = affectedPref
        .join(prefRows.select("key"), Seq("key"), "left_anti")
      prefPost.merge(prefRows, prefEmptied, ctx.batchId)

      // discover, both directions, against POST postings (residents and
      // same-batch partners both present)
      val newAsA = newPrefix.join(postFull, "f")
        .filter(col("member") =!= col("doc_id"))
        .select(col("doc_id").as("doc_a"), col("member").as("doc_b"))
      val newAsB = newFeats.join(postPref, "f")
        .filter(col("member") =!= col("doc_id"))
        .select(col("member").as("doc_a"), col("doc_id").as("doc_b"))
      val candidates = newAsA.union(newAsB).distinct()

      // exact verify over the candidate docs' texts (pruned state reads)
      val vIds = candidates.select(col("doc_a").as("key"))
        .union(candidates.select(col("doc_b").as("key"))).distinct()
      val vExploded = feats(post.rows(table, vIds))
      val verified = Dedup
        .verifyContainment(candidates, vExploded, theta)
        .persist(mem)
      ctx.defer(verified.unpersist())

      val upserts = verified.select(
        Keys.pair(col("doc_a"), col("doc_b")).as("id"),
        col("doc_a"), col("doc_b"), col("containment"))
      val deletes = retractCandidates
        .select(Keys.pair(col("doc_a"), col("doc_b")).as("id"))
        .join(upserts.select("id"), Seq("id"), "left_anti")
      (upserts, deletes)
    })
  }
}
