package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Hybrid retrieval — the RAG-serving read path a training-data engine
  * also owns: fuse a DENSE ranker (embedding cosine, the q40 family)
  * with a SPARSE ranker (BM25 over the probe document's own terms — the
  * "more-like-this" query) by Reciprocal Rank Fusion,
  * score(d) = Σ_r 1/(k + rank_r(d)), k = 60 (Cormack & Clarke 2009) —
  * the standard zero-tuning fusion that beats either ranker alone and
  * needs no score normalization (ranks, not raw scores, enter the sum).
  *
  * Partial coverage is first-class: at sf0.1 only a subset of documents
  * carry embeddings (2000 of 5000), exactly the production reality of a
  * half-backfilled vector index — docs missing from one ranking
  * contribute only the other's term via the full-outer fusion.
  *
  * Scale: the dense side is one corpus scan against NQ broadcast
  * probes; the sparse side joins the postings (tf) of the probes'
  * term set only (broadcast, like q60's query terms); per-ranker
  * rankings are windows over per-query candidate sets bounded by those
  * joins; fusion touches two top-20 lists per probe. Ranks are taken
  * over ROUND-6 scores, and the sparse ranker's per-term sum rides the
  * q138 DECIMAL ledger (12-rounded terms summed exactly) — so neither
  * engine choice nor cluster layout can flip a rank.
  */
object Retrieval {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val NQ = 8   // probe docs (vec_id < NQ carry text AND embedding)
  private val KR = 20  // per-ranker depth
  private val KF = 10  // fused output depth
  private val RK = 60  // RRF constant

  /** The RRF fusion step itself, shared verbatim by batch q167 and the
    * [[graft.streaming.StreamingHybrid]] read path (the kappaFromCells
    * posture — one code path, pinned once): full-outer join two
    * (query_id, id, rnk) rank lists, score 1/(RK + rank) per present
    * ranker (fixed two-term sum — no re-association), rank the fusion
    * by (rrf DESC, id) and keep the top `kF`. */
  def rrfFuse(dense: DataFrame, sparse: DataFrame, kF: Int = KF): DataFrame =
    dense.withColumnRenamed("rnk", "dr")
      .join(sparse.withColumnRenamed("rnk", "sr"),
        Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id").as("doc_id"),
        (coalesce(lit(1.0) / (lit(RK) + col("dr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RK) + col("sr")), lit(0.0))).as("rrf"),
        col("dr"), col("sr"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= kF)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("dr").cast("long").as("dense_rank"),
        col("sr").cast("long").as("sparse_rank"),
        round(col("rrf"), 9).as("rrf"))

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q167_hybrid_rrf",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < $NQ),
         |dsc AS (SELECT q.query_id, c.vec_id AS id,
         |    round(list_sum(list_transform(range(len(q.v)), i -> q.v[i+1]*c.v[i+1])) /
         |      (sqrt(list_sum(list_transform(range(len(q.v)), i -> q.v[i+1]*q.v[i+1]))) *
         |       sqrt(list_sum(list_transform(range(len(c.v)), i -> c.v[i+1]*c.v[i+1])))), 6) AS score
         |  FROM q JOIN e c ON c.vec_id <> q.query_id),
         |d20 AS (SELECT query_id, id, rnk FROM (
         |    SELECT query_id, id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, id) AS rnk FROM dsc) WHERE rnk <= $KR),
         |w AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |qt AS (SELECT doc_id AS query_id, term FROM tf WHERE doc_id < $NQ),
         |qterm AS (SELECT DISTINCT term FROM qt),
         |df AS (SELECT tf.term, count(*) AS df FROM tf JOIN qterm USING (term) GROUP BY 1),
         |ssc AS (SELECT qt.query_id, tf.doc_id AS id,
         |    round(CAST(sum(CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
         |      (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)), 12)
         |      AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
         |  FROM qt JOIN tf ON tf.term = qt.term AND tf.doc_id <> qt.query_id
         |    JOIN df ON df.term = tf.term
         |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
         |  GROUP BY 1, 2),
         |s20 AS (SELECT query_id, id, rnk FROM (
         |    SELECT query_id, id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, id) AS rnk FROM ssc) WHERE rnk <= $KR),
         |fused AS (SELECT coalesce(d.query_id, s.query_id) AS query_id,
         |    coalesce(d.id, s.id) AS doc_id,
         |    coalesce(1.0 / ($RK + d.rnk), 0.0) + coalesce(1.0 / ($RK + s.rnk), 0.0) AS rrf,
         |    d.rnk AS dense_rank, s.rnk AS sparse_rank
         |  FROM d20 d FULL OUTER JOIN s20 s
         |    ON d.query_id = s.query_id AND d.id = s.id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
         |  CAST(dense_rank AS BIGINT) AS dense_rank,
         |  CAST(sparse_rank AS BIGINT) AS sparse_rank,
         |  round(rrf, 9) AS rrf
         |FROM (SELECT query_id, doc_id, rrf, dense_rank, sparse_rank,
         |    row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
         |  FROM fused) WHERE rank <= $KF""".stripMargin.replace("\n", " ")) { (s, dir) =>
      // — dense ranking: one corpus scan against NQ broadcast probes —
      val e = t(s, dir, "embeddings")
      val qe = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val dsc = e.select(col("vec_id").as("id"), col("embedding").as("cv"))
        .join(broadcast(qe), col("id") =!= col("query_id"))
        .select(col("query_id"), col("id"),
          round(Similarity.cosine(col("qv"), col("cv")), 6).as("score"))
      def top(scored: DataFrame, k: Int): DataFrame = scored
        .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("id"))))
        .filter(col("rnk") <= k)
        .select("query_id", "id", "rnk")
      val d20 = top(dsc, KR)

      // — sparse ranking: BM25 of each probe's own terms (q60's exact
      //   formula). r13 opt (guide §2.3/§2.4): the token stream is
      //   FILTERED to the probes' term set BEFORE the (doc, term)
      //   aggregation — document frequency and the scoring join only
      //   ever consume those postings, so the full-vocabulary tf
      //   shuffle was thrown-away work; doc length rides the token
      //   rows from the same split() (row-local — the second corpus
      //   aggregation and its join are gone); and the surviving
      //   postings table is EAGER-persisted because its consumers
      //   include broadcast subqueries — a lazy persist let the
      //   broadcast threads race the cache and recompute the corpus
      //   explode in parallel (measured: one 33-task-second stage for
      //   a 5.5-task-second plan at sf0.1).
      // r14 (guide §2.4, the q37 move): one doc_id hash repartition
      // spreads the explode AND pre-clusters the (doc_id, dl, term)
      // postings aggregation and the (query_id, id) scoring rollup
      // (id == doc_id, a clustering subset), so the corpus-size token
      // rows never hit a further exchange; the probe filter still
      // pushes below the repartition to the scan.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      val toks = docs.select(col("doc_id"),
        size(col("w")).cast("long").as("dl"), explode(col("w")).as("term"))
      // r14: qt is the NQ probe docs' term set — filter to the probes
      // BEFORE the explode (guide §2.3). As `toks.filter(doc_id < NQ)`
      // its broadcast build re-ran the full corpus explode (9.7
      // task-seconds at sf0.1 for 8 docs' worth of terms); the probe
      // filter now reaches the parquet scan.
      val qt = docs.filter(col("doc_id") < NQ)
        .select(col("doc_id").as("query_id"), explode(col("w")).as("term"))
        .distinct()
      val qterm = qt.select("term").distinct()
      val tfq = graft.CacheScope.eager(
        toks.join(broadcast(qterm), Seq("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf")))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        avg(size(col("w")).cast("long")).as("avgdl"))
      val dfreq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
      val ssc = tfq.withColumnRenamed("doc_id", "id")
        .join(broadcast(qt), Seq("term"))
        .filter(col("id") =!= col("query_id"))
        .join(broadcast(dfreq), "term")
        .crossJoin(broadcast(stats))
        .select(col("query_id"), col("id"),
          // per-term contributions ride the q138 DECIMAL ledger: each
          // rounded to 12 and summed exactly, so the score — and
          // therefore the RANK — cannot move with reducer assignment
          // (PartitioningInvarianceSpec pins q167 re-layout-stable)
          round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") +
              lit(1.2) * (lit(1) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))),
            12).cast("decimal(28,12)").as("s"))
        .groupBy("query_id", "id")
        .agg(round(sum("s").cast("double"), 6).as("score"))
      val s20 = top(ssc, KR)

      // — reciprocal-rank fusion over the two top lists —
      rrfFuse(d20, s20, KF)
    }
  )
}
