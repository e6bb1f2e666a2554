package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.KMeans

/** Continuously-maintained SemDeDup removals — the streaming form of
  * batch q101 (Abbas et al. 2023: embedding dedup within trained
  * clusters only) over a CDC embeddings-shaped source, under a FROZEN
  * clustering model (the [[StreamingIvfPq]] posture: training is an
  * offline batch job, maintenance is online; new vectors are assigned
  * with the frozen centroids). The sink holds, at every instant, one
  * document per REMOVED vector: id = vec key, fields (vec_id, cluster,
  * n_dups, max_cos) — exactly what batch [[KMeans.semDedup]] computes
  * over the materialized corpus with the same model (keep-lowest-key:
  * state keys are strings, so the survivor order is the key order — the
  * spec pins batch == incremental under the same ordering).
  *
  * State: one posting list per cluster (cluster → member keys). Vectors
  * themselves are NOT duplicated into view state — they live in the
  * pipeline's materialized `embeddings` table and are fetched by key
  * (bucket-pruned) when a cluster re-scores.
  *
  * Maintenance is affected-CLUSTER recomputation: a batch vector
  * entering, leaving, or moving between clusters changes the removal
  * rows only of members of those clusters (a removal row for b counts
  * smaller-key same-cluster partners with cosine ≥ τ — cross-cluster
  * pairs never exist, the SemDeDup premise). Per batch: assign the
  * batch's pre and post vectors with the frozen model (narrow map, k×dim
  * literal centroids), update the touched clusters' posting lists
  * (idempotent-by-batchId), then re-derive those clusters' removal rows
  * from pre state (retract superset) and post state (upserts) with the
  * batch q101 join itself. Per-batch cost is O(Σ touched-cluster size²)
  * — the same Σ|c|² bound the batch algorithm's tractability rests on
  * (clusters stay bounded because k is trained ∝ n), and untouched
  * clusters are never read, let alone re-scored.
  */
object StreamingSemDeDup {

  private def postSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("members", ArrayType(StringType))))

  /** Continuous SemDeDup view. `model` is the frozen clustering;
    * defaults match batch q101 (τ = 0.45). */
  def semDedupView(
      spark: SparkSession, stateDir: String, model: KMeans.Model,
      name: String = "semdedup_view", table: String = "embeddings",
      vecCol: String = "embedding", tau: Double = 0.45,
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

      def assigned(rows: DataFrame): DataFrame = model
        .assign(rows.select(col("key").as("vec_id"),
          col(vecCol).cast(ArrayType(DoubleType)).as("v")))
        .select(col("vec_id"), col("cluster").cast("string").as("cluster"))

      val oldAssign = assigned(pre.rows(table, touched)).persist(mem)
      ctx.defer(oldAssign.unpersist())
      val newAssign = assigned(post.rows(table, touched)).persist(mem)
      ctx.defer(newAssign.unpersist())

      val affected = oldAssign.select("cluster")
        .union(newAssign.select("cluster")).distinct()
        .withColumnRenamed("cluster", "key").persist(mem)
      ctx.defer(affected.unpersist())

      val preMembers = postings.rowsForKeysAt(preV, postSchema, affected)
        .select(col("key").as("cluster"), explode(col("members")).as("vec_id"))
        .persist(mem)
      ctx.defer(preMembers.unpersist())
      val postMembers = preMembers.join(
          touched.withColumnRenamed("key", "vec_id"), Seq("vec_id"),
          "left_anti")
        .unionByName(newAssign.select("cluster", "vec_id"))
        .persist(mem)
      ctx.defer(postMembers.unpersist())
      val rows = postMembers.groupBy("cluster")
        .agg(collect_list("vec_id").as("members"))
        .select(col("cluster").as("key"), col("members"))
      val emptied = affected.join(rows.select("key"), Seq("key"), "left_anti")
      postings.merge(rows, emptied, ctx.batchId)

      /** Batch q101 removal rows for the touched clusters from one state
        * image: member vectors fetched by key (bucket-pruned), then
        * [[KMeans.semDedup]]'s own within-cluster join — restricted to a
        * SINGLE-cluster assignment frame, so the shared code path is the
        * pinned one. */
      def score(members: DataFrame, state: StateAccess): DataFrame = {
        val keys = members.select(col("vec_id").as("key")).distinct()
        val vecs = state.rows(table, keys)
          .select(col("key").as("vec_id"),
            col(vecCol).cast(ArrayType(DoubleType)).as("v"))
        // re-assign from the frozen model rather than trusting the
        // posting side: identical by determinism, and keeps semDedup's
        // contract (one cluster per vector) locally checkable
        KMeans.semDedup(vecs, model, tau)
      }

      val postScore = score(postMembers, post).persist(mem)
      ctx.defer(postScore.unpersist())
      val preScore = score(preMembers, pre)

      val upserts = postScore.select(
        col("vec_id").as("id"), col("vec_id"),
        col("cluster").cast("string").as("cluster"),
        col("n_dups"), col("max_cos"))
      val deletes = preScore.select(col("vec_id").as("id"))
        .join(upserts.select("id"), Seq("id"), "left_anti")
      (upserts, deletes)
    })
  }
}
