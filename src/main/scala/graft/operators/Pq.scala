package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.QueryDef
import graft.sources.Tables

/** Product quantization for embedding compression + asymmetric-distance
  * ANN (Jégou et al., TPAMI 2011 — public method): each vector is cut
  * into `m` subvectors, each subspace gets its own k-centroid codebook,
  * and a vector is stored as m small codes (here m=8 × k=16 → 8 codes
  * of 4 bits = 4 bytes for a 64-dim float vector, a 64× compression).
  *
  * Why this is the 100 TB shape for similarity search:
  *  - the CODES table (4 bytes/vector) is what search scans — the raw
  *    vectors are only read once at encode time;
  *  - a probe precomputes its m×k distance TABLE once (asymmetric
  *    distance: exact query subvector vs quantized corpus), and every
  *    corpus candidate then costs m array lookups instead of a d-dim
  *    dot product — per-candidate work drops 8× here, d/m× in general;
  *  - codebooks are m×k×(d/m) doubles = bounded driver metadata,
  *    broadcast into plans as literals (the k-means-centroid posture);
  *    training state never grows with the corpus;
  *  - all three phases (train update, encode, search) are narrow maps
  *    plus one map-side-combined agg — no pairwise joins anywhere; at
  *    cluster scale the codes table composes with the IVF cell layout
  *    (q42's partition-pruned scan) for IVF-PQ.
  *
  * Training runs ONE joint Lloyd loop over all m subspaces at once: the
  * (vec_id, sub, vs) exploded frame assigns every subvector against its
  * own codebook in a single pass, and the update aggregates
  * (sub, code, dim) partial means — m×k×(d/m) rows to the driver per
  * iteration, corpus-independent.
  */
object Pq {

  /** Codebooks indexed [subspace][code][dim]; `ds` = dims per subspace. */
  final case class Model(m: Int, k: Int, ds: Int,
      codebooks: Seq[Seq[Seq[Double]]]) {
    def codebookLit: Column = typedlit(codebooks)
    def normLit: Column =
      typedlit(codebooks.map(_.map(c => c.map(x => x * x).sum)))
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Subvector of `v` for subspace `sub` (0-based), ds dims each. */
  private def subvec(v: Column, sub: Column, ds: Int): Column =
    slice(v, sub * ds + 1, lit(ds))

  /** argmin code for one subvector against subspace `sub`'s codebook:
    * ‖vs‖² is common across the k candidates, so the comparison key is
    * ‖c‖² − 2·vs·c (the KMeans.assign identity). */
  private def argminCode(model: Model, vs: Column, sub: Column): Column = {
    val cb = model.codebookLit
    val cn = model.normLit
    aggregate(sequence(lit(0), lit(model.k - 1)),
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
      (acc, i) => {
        val d = element_at(element_at(cn, sub + 1), i + 1) -
          lit(2.0) * dot(vs, element_at(element_at(cb, sub + 1), i + 1))
        when(d < acc("d"), struct(d.as("d"), i.as("c"))).otherwise(acc)
      })("c")
  }

  /** Train m×k codebooks by joint Lloyd over all subspaces. `vectors`:
    * (vec_id, v). Deterministic: subspace seeds are slices of one
    * full-vector farthest-point pass, and every update is an exact
    * mean. */
  def fit(vectors: DataFrame, m: Int, k: Int, maxIters: Int = 5,
      tol: Double = 1e-9): Model = {
    val vs = vectors.select(col("vec_id"),
      col("v").cast(ArrayType(DoubleType)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dims = vs.select(size(col("v"))).head().getInt(0)
      require(dims % m == 0, s"dims=$dims not divisible by m=$m")
      val ds = dims / m
      val seeds = KMeans.farthestPointInit(vs, k)
      var model = Model(m, k, ds, (0 until m).map(sub =>
        seeds.map(_.slice(sub * ds, sub * ds + ds))))
      // one exploded (vec_id, sub, vs) frame drives every iteration
      val sub = vs.select(col("vec_id"),
          explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
        .select(col("vec_id"), col("sub"),
          subvec(col("v"), col("sub"), ds).as("vs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var iter = 0
        var moved = Double.MaxValue
        while (iter < maxIters && moved > tol) {
          // two selects on purpose: a generator (posexplode) in the SAME
          // select as the higher-order argmin trips Spark's generator
          // pull-out rewrite, which strips the aliases inside the
          // lambda's struct and fails the CASE type check
          val means = sub
            .select(col("sub"),
              argminCode(model, col("vs"), col("sub")).as("code"),
              col("vs"))
            .select(col("sub"), col("code"), posexplode(col("vs")))
            .groupBy("sub", "code", "pos").agg(avg("col").as("x"))
            .groupBy("sub", "code")
            .agg(array_sort(collect_list(struct(col("pos"), col("x"))))
              .as("cs"))
            .select(col("sub"), col("code"), col("cs.x").as("centroid"))
            .collect()
            .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
            .toMap
          val next = (0 until m).map(s => (0 until k).map(c =>
            means.getOrElse((s, c), model.codebooks(s)(c))))
          moved = model.codebooks.flatten.flatten
            .zip(next.flatten.flatten)
            .map { case (a, b) => (a - b) * (a - b) }.max
          model = model.copy(codebooks = next)
          iter += 1
        }
        model
      } finally sub.unpersist(blocking = false)
    } finally vs.unpersist(blocking = false)
  }

  /** Encode vectors as m codes each — the 4-byte-per-vector table that
    * replaces the raw embeddings at search time. Narrow map. */
  def encode(model: Model, vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"),
      col("v").cast(ArrayType(DoubleType)).as("v"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(model.m - 1)), s =>
          argminCode(model, subvec(col("v"), s, model.ds), s)).as("codes"))

  /** A probe's m×k table of exact ‖q_sub − c‖² entries — computed ONCE
    * per probe row; shared by the flat ADC search, the composed IVF-PQ
    * path AND the streaming index's search
    * ([[graft.streaming.StreamingIvfPq]]) so the arithmetic cannot
    * drift between them. */
  private[graft] def distanceTable(model: Model, qv: Column): Column = {
    val cb = model.codebookLit
    val cn = model.normLit
    transform(sequence(lit(0), lit(model.m - 1)), s =>
      transform(sequence(lit(0), lit(model.k - 1)), c => {
        val qs = subvec(qv.cast(ArrayType(DoubleType)), s, model.ds)
        val cv = element_at(element_at(cb, s + 1), c + 1)
        dot(qs, qs) - lit(2.0) * dot(qs, cv) +
          element_at(element_at(cn, s + 1), c + 1)
      }))
  }

  /** ADC distance: m table lookups of `dt` indexed by `codes`. */
  private[graft] def adcD2(model: Model, dt: Column, codes: Column): Column =
    aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(dt, s + 1),
        element_at(codes, s + 1) + 1))

  /** Asymmetric-distance top-k: each probe precomputes its m×k table
    * of exact ‖q_sub − c‖² entries ONCE, the (small) probes-with-table
    * frame is broadcast against the codes table, and each candidate
    * costs m lookups. Output (query_id, rank, neighbor_id, approx_d2),
    * ties (distance ASC, id ASC). */
  def adcSearch(model: Model, codes: DataFrame, probes: DataFrame,
      topK: Int, excludeSelf: Boolean = true): DataFrame = {
    val probesT = probes.select(col("query_id"),
      distanceTable(model, col("qv")).as("dt"))
    val paired = codes.crossJoin(broadcast(probesT))
    val candidates =
      if (excludeSelf) paired.filter(col("vec_id") =!= col("query_id"))
      else paired
    val d2 = adcD2(model, col("dt"), col("codes"))
    val topk = udaf(new graft.functions.TopKAggregator(topK))
    candidates
      .select(col("query_id"), col("vec_id"), (-d2).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        round(-col("col.score"), 6).as("approx_d2"))
  }

  /** The production PQ search shape: ADC shortlist of `shortlist ×
    * topK` candidates, then EXACT re-rank of only those — quantization
    * noise decides which ~50 candidates to look at, never the final
    * order. The re-rank join touches `probes × shortlist × topK` raw
    * vectors (a keyed semi-join-sized read, corpus-independent), so the
    * full-precision pass costs a rounding error of the scan the codes
    * table saved. Output (query_id, rank, neighbor_id, d2) with EXACT
    * squared distances, ties (d2 ASC, id ASC). */
  def adcSearchReranked(model: Model, codes: DataFrame, vectors: DataFrame,
      probes: DataFrame, topK: Int, shortlist: Int = 10,
      excludeSelf: Boolean = true): DataFrame = {
    val short = adcSearch(model, codes, probes, topK * shortlist, excludeSelf)
      .select("query_id", "neighbor_id")
    val exact = short
      .join(probes, "query_id")
      .join(vectors.select(col("vec_id").as("neighbor_id"),
        col("v").cast(ArrayType(DoubleType)).as("nv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), {
        val q = col("qv").cast(ArrayType(DoubleType))
        dot(q, q) - lit(2.0) * dot(q, col("nv")) + dot(col("nv"), col("nv"))
      }.as("d2"))
    val topk = udaf(new graft.functions.TopKAggregator(topK))
    exact
      .select(col("query_id"), col("neighbor_id"), (-col("d2")).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        round(greatest(-col("col.score"), lit(0.0)), 6).as("d2"))
  }

  /** Persist codebooks as a tiny (sub, code, centroid) parquet table —
    * the model-registry step: encode/search jobs load m×k×(d/m)
    * doubles instead of re-fitting the corpus ([[KMeans.Model.save]]
    * posture). */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    (for (s <- 0 until model.m; c <- 0 until model.k)
      yield (s, c, model.codebooks(s)(c)))
      .toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[Model]] persisted by [[save]]. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
      .toMap
    val m = rows.keys.map(_._1).max + 1
    val k = rows.keys.map(_._2).max + 1
    Model(m, k, rows((0, 0)).size,
      (0 until m).map(s => (0 until k).map(c => rows((s, c)))))
  }

  /** Train-once memo per (session, sf-dir) — the fitted-model posture
    * shared with KMeans/Bpe. */
  private val fitted =
    scala.collection.concurrent.TrieMap.empty[(String, String), Model]
  private[operators] def fittedModel(s: SparkSession, dir: String): Model =
    graft.BuildMetrics.memo(fitted,
        (graft.SessionMemo.key(s), dir), "pq_codebooks") {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
      fit(e, m = 16, k = 16, maxIters = 5)
    }

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), i -> $a[i+1] * $b[i+1]))"

  /** DuckDB replica of the ENTIRE PQ pipeline through the probe
    * distance tables — the q43/q44 unrolled-trainer recipe applied to
    * product quantization, turning q97/q99 from no-oracle rows into
    * hash-compared ones (r6 VERDICT #4). The chain replicates [[fit]]
    * exactly:
    *  - farthest-point seeds over FULL vectors (16 seeds, same
    *    `cn − 2·v·c` comparison key and (nd DESC, vec_id) tie order as
    *    [[KMeans.farthestPointInit]]), sliced per subspace into cb0;
    *  - 5 joint Lloyd rounds over the exploded (vec_id, sub, vs) frame:
    *    assignment by row_number (d ASC, code ASC) — [[argminCode]]'s
    *    strict-< fold — and exact per-(sub, code, pos) means, empty
    *    codes keeping their previous centroid (LEFT JOIN + coalesce);
    *    the engine's `moved < tol` early stop needs no replica because
    *    extra unrolled rounds past a fixpoint are identity;
    *  - `enc` = the corpus encoded under cb5 (the engine's memoized
    *    codes table), `qt` = each probe's m×k asymmetric distance table
    *    ([[distanceTable]]'s ‖q_s − c‖² entries).
    * `AS MATERIALIZED` throughout — every CTE is referenced more than
    * once and DuckDB's inlining would re-run the trainer exponentially
    * (the Bpe.bpeCtes lesson). Float parity: all dots are the same
    * left-to-right double folds both engines use everywhere (q42
    * precedent); the only cross-engine risk is a shortlist-boundary
    * near-tie in the ADC sums, which the synthetic corpus's margins
    * keep clear of (verified green at the gate). */
  private val pqTrainCtes: String = {
    def d(a: String, b: String) = dotSql(a, b)
    val head = Seq(
      "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
      "sd1 AS MATERIALIZED (SELECT v AS c FROM e ORDER BY vec_id LIMIT 1)",
      s"d1 AS MATERIALIZED (SELECT e.vec_id, e.v, ${d("sd1.c", "sd1.c")} - 2.0 * ${d("e.v", "sd1.c")} AS nd FROM e, sd1)")
    val seeds = (2 to 16).flatMap { k =>
      val sd = s"sd$k AS MATERIALIZED (SELECT v AS c FROM d${k - 1} ORDER BY nd DESC, vec_id LIMIT 1)"
      if (k < 16) Seq(sd,
        s"d$k AS MATERIALIZED (SELECT d.vec_id, d.v, least(d.nd, ${d("s.c", "s.c")} - 2.0 * ${d("d.v", "s.c")}) AS nd FROM d${k - 1} d, sd$k s)")
      else Seq(sd)
    }
    val seed = "seed AS MATERIALIZED (" + (0 until 16)
      .map(i => s"SELECT $i AS code, c FROM sd${i + 1}")
      .mkString(" UNION ALL ") + ")"
    val cb0 = "cb0 AS MATERIALIZED (SELECT CAST(s.sub AS INT) AS sub, seed.code, " +
      "seed.c[CAST(s.sub*4+1 AS INT):CAST(s.sub*4+4 AS INT)] AS c " +
      "FROM seed, unnest(range(16)) AS s(sub))"
    val sv = "sv AS MATERIALIZED (SELECT e.vec_id, CAST(s.sub AS INT) AS sub, " +
      "e.v[CAST(s.sub*4+1 AS INT):CAST(s.sub*4+4 AS INT)] AS vs " +
      "FROM e, unnest(range(16)) AS s(sub))"
    val svx = "svx AS MATERIALIZED (SELECT vec_id, sub, unnest(vs) AS val, " +
      "generate_subscripts(vs, 1) AS pos FROM sv)"
    val iters = (1 to 5).flatMap { t =>
      val prev = s"cb${t - 1}"
      Seq(
        s"""pa$t AS MATERIALIZED (SELECT vec_id, sub, code FROM (
           |  SELECT sv.vec_id, sv.sub, cb.code,
           |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
           |      ${d("cb.c", "cb.c")} - 2.0 * ${d("sv.vs", "cb.c")} ASC, cb.code ASC) AS rk
           |  FROM sv JOIN $prev cb ON cb.sub = sv.sub) WHERE rk = 1)""".stripMargin,
        s"""pm$t AS MATERIALIZED (SELECT sub, code,
           |    list_transform(range(4), p -> avgs[CAST(p+1 AS INT)]) AS c FROM (
           |  SELECT sub, code, array_agg(m ORDER BY pos) AS avgs FROM (
           |    SELECT a.sub, a.code, x.pos, avg(x.val) AS m
           |    FROM pa$t a JOIN svx x ON a.vec_id = x.vec_id AND a.sub = x.sub
           |    GROUP BY 1, 2, 3) GROUP BY 1, 2))""".stripMargin,
        s"""cb$t AS MATERIALIZED (SELECT p.sub, p.code, coalesce(m.c, p.c) AS c
           |  FROM $prev p LEFT JOIN pm$t m ON p.sub = m.sub AND p.code = m.code)""".stripMargin)
    }
    val enc =
      s"""enc AS MATERIALIZED (SELECT vec_id, sub, code FROM (
         |  SELECT sv.vec_id, sv.sub, cb.code,
         |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
         |      ${d("cb.c", "cb.c")} - 2.0 * ${d("sv.vs", "cb.c")} ASC, cb.code ASC) AS rk
         |  FROM sv JOIN cb5 cb ON cb.sub = sv.sub) WHERE rk = 1)""".stripMargin
    val pr = "pr AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5)"
    val qsub = "qsub AS MATERIALIZED (SELECT query_id, CAST(s.sub AS INT) AS sub, " +
      "qv[CAST(s.sub*4+1 AS INT):CAST(s.sub*4+4 AS INT)] AS qs " +
      "FROM pr, unnest(range(16)) AS s(sub))"
    val qt =
      s"""qt AS MATERIALIZED (SELECT q.query_id, q.sub, cb.code,
         |    ${d("q.qs", "q.qs")} - 2.0 * ${d("q.qs", "cb.c")} + ${d("cb.c", "cb.c")} AS dt
         |  FROM qsub q JOIN cb5 cb ON cb.sub = q.sub)""".stripMargin
    (head ++ seeds ++ Seq(seed, cb0, sv, svx) ++ iters ++ Seq(enc, pr, qsub, qt))
      .mkString(",\n")
  }

  /** q97's oracle: flat ADC shortlist (50 = topK × 10, ties
    * (d2 ASC, id ASC) — [[graft.functions.TopKAggregator]]'s order)
    * then exact re-rank of the shortlist, top 5. */
  private val pqAnnOracle: String = {
    def d(a: String, b: String) = dotSql(a, b)
    (s"WITH $pqTrainCtes,\n" +
      s"""adc AS MATERIALIZED (SELECT t.query_id, c.vec_id, sum(t.dt) AS ad2
         |  FROM enc c JOIN qt t ON t.sub = c.sub AND t.code = c.code
         |  WHERE c.vec_id <> t.query_id GROUP BY 1, 2),
         |short AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY ad2 ASC, vec_id ASC) AS rk FROM adc) WHERE rk <= 50),
         |rr AS (SELECT s.query_id, s.vec_id AS neighbor_id,
         |    ${d("pr.qv", "pr.qv")} - 2.0 * ${d("pr.qv", "e2.v")} + ${d("e2.v", "e2.v")} AS d2
         |  FROM short s JOIN pr ON pr.query_id = s.query_id
         |  JOIN e e2 ON e2.vec_id = s.vec_id)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  round(greatest(d2, 0.0), 6) AS d2 FROM (
         |  SELECT query_id, neighbor_id, d2,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, neighbor_id ASC) AS rank FROM rr)
         |WHERE rank <= 5""".stripMargin).replace("\n", " ")
  }

  /** q99's oracle: the same trained codes, routed — per-label mean
    * centroids (the GIVEN cell layout, q42's oracle), each probe to its
    * 2 nearest cells by the engine's elementwise Σ(a−b)² euclidean,
    * ADC shortlist over ONLY the probed cells' members, exact re-rank. */
  private val ivfPqOracle: String = {
    def d(a: String, b: String) = dotSql(a, b)
    (s"WITH $pqTrainCtes,\n" +
      s"""el AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |lx AS (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM el),
         |lc AS MATERIALIZED (SELECT label,
         |    list_transform(range(64), p -> avgs[CAST(p+1 AS INT)]) AS c FROM (
         |  SELECT label, array_agg(m ORDER BY pos) AS avgs FROM (
         |    SELECT label, pos, avg(val) AS m FROM lx GROUP BY 1, 2) GROUP BY 1)),
         |route AS MATERIALIZED (SELECT query_id, label FROM (
         |  SELECT pr.query_id, lc.label,
         |    row_number() OVER (PARTITION BY pr.query_id ORDER BY
         |      ROUND(list_sum(list_transform(range(64),
         |        i -> (pr.qv[i+1] - lc.c[i+1]) * (pr.qv[i+1] - lc.c[i+1]))), 6) ASC,
         |      lc.label ASC) AS rk
         |  FROM pr, lc) WHERE rk <= 2),
         |adc AS MATERIALIZED (SELECT r.query_id, el.vec_id, sum(t.dt) AS ad2
         |  FROM route r JOIN el ON el.label = r.label AND el.vec_id <> r.query_id
         |  JOIN enc c ON c.vec_id = el.vec_id
         |  JOIN qt t ON t.query_id = r.query_id AND t.sub = c.sub AND t.code = c.code
         |  GROUP BY 1, 2),
         |short AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY ad2 ASC, vec_id ASC) AS rk FROM adc) WHERE rk <= 50),
         |rr AS (SELECT s.query_id, s.vec_id AS neighbor_id,
         |    ${d("pr.qv", "pr.qv")} - 2.0 * ${d("pr.qv", "e2.v")} + ${d("e2.v", "e2.v")} AS d2
         |  FROM short s JOIN pr ON pr.query_id = s.query_id
         |  JOIN el e2 ON e2.vec_id = s.vec_id)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  round(greatest(d2, 0.0), 6) AS d2 FROM (
         |  SELECT query_id, neighbor_id, d2,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY d2 ASC, neighbor_id ASC) AS rank FROM rr)
         |WHERE rank <= 5""".stripMargin).replace("\n", " ")
  }

  val queries: Seq[QueryDef] = Seq(

    /** PQ-compressed ANN, full production shape: encode the corpus
      * (16 codes/vector = 16× compression of the float rows), ADC
      * shortlist, exact re-rank — top-5 for the first 5 vectors.
      * Config is a measured trade on this corpus: m=8×k=16 leaves 55%
      * of the vector energy as quantization noise (shortlist recall
      * 0.40 at depth 20); m=16×k=16 with a 10× shortlist captures
      * ~0.9 of the exact top-5 before the exact pass fixes the order.
      * Oracle-checked since r7 ([[pqAnnOracle]] — the deterministic
      * trainer unrolled as CTEs); `PqSpec` additionally pins recall
      * against exact euclidean brute force, the ADC identity
      * (self-distance == the directly-computed quantization error),
      * the Lloyd centroid-mean invariant, and determinism. */
    QueryDef("q97_pq_ann", pqAnnOracle) { (s, dir) =>
      val model = fittedModel(s, dir)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
      // encode-once: searches read the 16-byte/vector codes table, they
      // never re-encode the corpus (the q42/q99 train-once posture)
      val codes = s.read.parquet(pqCodesPath(s, dir))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      adcSearchReranked(model, codes, e, probes, topK = 5)
    },

    /** IVF-PQ — the composed 100 TB ANN architecture: q42's
      * partition-pruned cell layout carries PQ CODES, so a search reads
      * (a) a metadata-sized centroid table to route each probe to its
      * nprobe cells driver-side, (b) ONLY the probed cells' code
      * partitions (4–16 bytes a vector) for the ADC shortlist, and
      * (c) only the shortlisted raw vectors — again from pruned cell
      * partitions — for the exact re-rank. Nothing corpus-sized is
      * ever scanned at full precision. Oracle-checked since r7
      * ([[ivfPqOracle]] — trained codes + routed cells, unrolled);
      * `PlanSpec` pins the partition filters on both reads; `PqSpec`
      * pins the machinery exactly (full-shortlist search == brute force
      * within the probed cells). */
    QueryDef("q99_ivfpq_topk", ivfPqOracle) { (s, dir) =>
      ivfPqSearch(s, dir, topK = 5, nprobe = 2, shortlist = 10)
    }
  )

  /** Session-scoped train-once FLAT codes table for q97 — encode once,
    * search many (the q99 cell layout without the cell partitioning):
    * every search reads the 16-byte/vector parquet codes instead of
    * re-encoding the corpus per run. */
  private val flatCodesPaths =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private[operators] def pqCodesPath(s: SparkSession, dir: String): String =
    graft.BuildMetrics.memo(flatCodesPaths,
        (graft.SessionMemo.key(s), dir), "pq_codes") {
      val path = graft.SessionMemo.tempDir("graft-pq-codes")
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
      encode(fittedModel(s, dir), e).write.mode("overwrite").parquet(path)
      path
    }

  /** Session-scoped train-once PQ-codes layout for q99: the corpus
    * encoded to m codes/vector, hive-partitioned by the same cell
    * assignment as [[Similarity.ivfIndexPath]]'s raw-vector cells. */
  private val codesPaths =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private[operators] def ivfPqCodesPath(s: SparkSession, dir: String): String =
    graft.BuildMetrics.memo(codesPaths,
        (graft.SessionMemo.key(s), dir), "ivfpq_codes") {
      val path = graft.SessionMemo.tempDir("graft-ivfpq-codes")
      val model = fittedModel(s, dir)
      val e = t(s, dir, "embeddings")
      encode(model, e.select(col("vec_id"), col("embedding").as("v")))
        .join(e.select("vec_id", "label"), "vec_id")
        .write.mode("overwrite").partitionBy("label").parquet(path)
      path
    }

  /** Routed IVF-PQ search (see q99). `shortlist` multiplies topK to set
    * ADC shortlist depth; probes = the first 5 corpus vectors. */
  private[operators] def ivfPqSearch(s: SparkSession, dir: String,
      topK: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val model = fittedModel(s, dir)
    val idx = Similarity.ivfIndexPath(s, dir)
    val codesPath = ivfPqCodesPath(s, dir)

    // driver-side routing: NQ×k×dim arithmetic on the metadata-sized
    // centroid table, euclidean to match how PQ ranks candidates
    val cents = s.read.parquet(s"$idx/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val probes = t(s, dir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // routing distance rounds to 6 on BOTH engine and oracle sides
    // before the rank: each engine computes its own per-label centroids
    // (Spark partial-agg avg vs DuckDB sequential avg), and a last-ulp
    // difference must not flip which cell takes rank nprobe on a
    // near-tie (the q42 discipline)
    def r6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val routed = probes.flatMap { case (qid, qv) =>
      val qd = qv.map(_.toDouble)
      cents.map { case (lbl, c) =>
        val d2 = qd.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (r6(d2), lbl)
      }.sortBy { case (d2, lbl) => (d2, lbl) }.take(nprobe)
        .map { case (_, lbl) => (qid, lbl, qv) }
    }
    val probedLabels = routed.map(_._2).distinct.toSeq

    import s.implicits._
    val routedDf = s.createDataset(routed.toSeq)
      .toDF("query_id", "probe_label", "qv")

    // ADC shortlist over ONLY the probed cells' code partitions
    val probesT = routedDf
      .select(col("query_id"), col("probe_label"), col("qv"),
        distanceTable(model, col("qv")).as("dt"))
    val codes = s.read.parquet(codesPath)
      .filter(col("label").isin(probedLabels: _*))
    val d2adc = adcD2(model, col("dt"), col("codes"))
    val short = udaf(new graft.functions.TopKAggregator(topK * shortlist))
    val shortlisted = codes.join(broadcast(probesT),
        col("label") === col("probe_label") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), (-d2adc).as("score"))
      .groupBy("query_id")
      .agg(short(col("score"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))

    // exact re-rank from the pruned RAW cells — shortlist-sized read
    val cells = s.read.parquet(s"$idx/cells")
      .filter(col("label").isin(probedLabels: _*))
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("nv"))
    val qvs = routedDf.select("query_id", "qv").distinct()
    val topk = udaf(new graft.functions.TopKAggregator(topK))
    shortlisted
      .join(broadcast(qvs), "query_id")
      .join(cells, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), {
        val q = col("qv").cast(ArrayType(DoubleType))
        (-(dot(q, q) - lit(2.0) * dot(q, col("nv")) +
          dot(col("nv"), col("nv")))).as("score")
      })
      .groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        round(greatest(-col("col.score"), lit(0.0)), 6).as("d2"))
  }
}
