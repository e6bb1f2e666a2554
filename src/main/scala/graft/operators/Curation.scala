package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** The end-to-end training-data curation pipeline as ONE query:
  * quality-filter → near-duplicate survivor selection → deterministic
  * split assignment. This is the composition a corpus operator actually
  * runs nightly (each stage exists standalone as q30/q36/q34); the gate
  * checks the composed materialization, including that survivor
  * selection keeps exactly one document per near-dup cluster.
  *
  * Scale shape: the quality filter is pure column arithmetic applied at
  * the scan (cheap docs drop before anything shuffles); dedup work runs
  * on the banded-LSH pair graph (∝ duplicates, never n²); the final
  * anti-join ships only loser doc ids.
  */
object Curation {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Shared with the q36 oracle (and q118's histogram): near-dup
    * clusters (jaccard ≥ 0.8 on word 3-shingles) via DuckDB's recursive
    * reachability. */
  private[operators] val clusterCtes =
    """w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(greatest(len(w)-2,0)),
      |        i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS sh FROM w),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE len(a.sh) > 0 AND len(b.sh) > 0 AND len(list_intersect(a.sh, b.sh)) * 1.0 /
      |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |  UNION SELECT doc_a, doc_a FROM pairs
      |  UNION SELECT doc_b, doc_b FROM pairs),
      |reach(u, v) AS (SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |clusters AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
      |""".stripMargin

  /** Shared Java-regex ∩ RE2 PII patterns (q93 + the streaming scrub).
    * Declared before `queries` — the oracle strings interpolate them at
    * object init. */
  private[graft] val EmailPat =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhonePat = "\\b555-[0-9]{4}\\b"
  private[graft] val IpPat =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Masked text: email → phone → IP replacement (order-safe — masks
    * contain no digits, the classes cannot overlap textually). */
  def piiRedact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"), IpPat, "<IP>")

  /** q157's chunk fingerprints: md5 of every FULL 32-token window at
    * stride 24 (8-token overlap), empty array for docs under 32 tokens.
    * ONE Column definition shared by the batch rollup and the
    * continuous shared-chunk view so the two cannot drift. */
  private[graft] def chunkHashes(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val w = split(trim(text), "\\s+")
    when(size(w) >= 32,
      transform(
        sequence(lit(0), floor((size(w) - 32) / 24).cast("int")),
        i => md5(concat_ws(" ", slice(w, i * 24 + 1, lit(32))))))
      .otherwise(array().cast("array<string>"))
  }

  /** q169's content-defined chunk digests as ONE row-local Column —
    * the per-document form the streaming twin chunks batch docs with
    * (batch q169 itself uses the exploded-row codegen path: same
    * boundary rule, corpus-scale plumbing; CurationSpec pins the two
    * equal on identical input). Boundary = char 8-gram md5-prefix hash
    * ≡ 0 (mod 64), cut after the window, final cut at doc end. */
  private[graft] def cdcChunkHashes(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val n = length(text).cast("long")
    val winHash = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(text.substr((c - 7).cast("int"), lit(8))), 1, 8),
        16, 10).cast("long")
    val cuts = when(n >= 8,
      filter(
        transform(sequence(lit(8L), n), c => c),
        c => winHash(c) % 64 === 0 && c < n))
      .otherwise(array().cast("array<long>"))
    val starts = concat(array(lit(0L)), cuts)
    transform(
      sequence(lit(0), size(starts) - 1),
      j => {
        val start = element_at(starts, j + 1)
        val fin = when(j + 1 < size(starts), element_at(starts, j + 2))
          .otherwise(n)
        md5(text.substr((start + 1).cast("int"), (fin - start).cast("int")))
      })
  }

  /** The scrub report columns shared by batch q93 and the streaming
    * view: per-class match counts + an md5 signature of the redaction. */
  def piiColumns(text: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    regexp_count(text, lit(EmailPat)).cast("long").as("n_emails"),
    regexp_count(text, lit(PhonePat)).cast("long").as("n_phones"),
    regexp_count(text, lit(IpPat)).cast("long").as("n_ips"),
    md5(piiRedact(text)).as("clean_sig"))

  /** The policy blocklist (stand-in for a production dictionary) and
    * q139's per-document report, shared with the streaming gate view —
    * ONE code path, pinned once. Pure row-local array arithmetic (the
    * q72 posture): tokenize, filter against the literal IN-set, exact
    * integer density rule — NO explode, NO shuffle, so the batch plan
    * is a single narrow projection over the scan and the streaming
    * form is stateless.
    *
    * Empty-text contract: split(trim('')) yields [""] on both engines —
    * a phantom token — so empty strings are filtered out of the token
    * array and a blank document reports n_tokens = 0 with keep = true
    * (zero blocked content gives this gate no grounds to drop; length
    * gates like Gopher own the degenerate-length verdict). q138's
    * no-row rule doesn't fit here: this report is a per-document
    * verdict table, so every document gets a row. `matched_terms` is a
    * sorted comma-joined STRING, not an array — the gate's pandas
    * comparator cannot sort/hash LIST columns (terms are \s+-split
    * tokens, so the comma join is unambiguous). */
  private[graft] val blocklistTerms = Seq("slow", "hash", "vector")

  def blocklistReport(df: DataFrame,
      id: org.apache.spark.sql.Column): DataFrame = {
    val toks = filter(split(trim(col("text")), "\\s+"), t => length(t) > 0)
    val blocked = filter(toks, t => t.isInCollection(blocklistTerms))
    df.select(id,
      size(toks).cast("long").as("n_tokens"),
      size(blocked).cast("long").as("n_blocked"),
      array_join(sort_array(array_distinct(blocked)), ",")
        .as("matched_terms"),
      (lit(10) * size(blocked) < size(toks) || size(toks) === 0).as("keep"))
  }

  /** The C4 line-filter report shared by batch q128 and the streaming
    * gate (one code path, the [[TextAnalysis.gopherRules]]/[[piiColumns]]
    * pin discipline): regroup words into planted 10-word lines (the
    * corpus is newline-free — `docIdNum` drives the deterministic plant
    * schedule), apply the Raffel 2020 per-line keeps and page drops, and
    * emit (id, n_lines, n_kept, page_keep, cleaned). Pure per-row column
    * arithmetic — no shuffle, stateless in the streaming form. */
  def c4Report(df: DataFrame, id: org.apache.spark.sql.Column,
      docIdNum: org.apache.spark.sql.Column): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val lines = transform(
      sequence(lit(0), ((size(words) + lit(9)) / lit(10)).cast("int") - 1),
      l => concat(
        array_join(slice(words, l * 10 + 1, lit(10)), " "),
        when((docIdNum + l) % 11 === 0, " javascript").otherwise(""),
        when(docIdNum % 13 === 0 && l === 0, " lorem ipsum").otherwise(""),
        when(docIdNum % 17 === 0 && l === 1, " {").otherwise(""),
        when((docIdNum + l) % 3 =!= 0, ".").otherwise("")))
    val keptLine = (ln: org.apache.spark.sql.Column) =>
      ln.endsWith(".") && size(split(ln, "\\s+")) >= 5 &&
        !ln.contains("javascript")
    df
      .select(id, lines.as("lines"))
      .select(col("*"),
        size(col("lines")).cast("long").as("n_lines"),
        filter(col("lines"), keptLine).as("kept"),
        (!exists(col("lines"), _.contains("lorem ipsum")) &&
          !exists(col("lines"), _.contains("{"))).as("clean_page"))
      .drop("lines")
      .select(col("*"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("kept")) >= 3 && col("clean_page")).as("page_keep"),
        array_join(col("kept"), "\n").as("cleaned"))
      .drop("kept", "clean_page")
  }

  /** q26's oracle, shared verbatim with q146: the bloom gate is a
    * plan-level optimization that must be invisible in the result (a
    * bloom false positive is culled by the exact gram join; a true
    * positive would have joined anyway), so both queries answer to the
    * SAME SQL. */
  private val decontaminateOracle: String = {
    val splitCase =
      """CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
        |     WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
        |     ELSE 'test' END""".stripMargin
    val gram = (1 to 5).map(k => s"w[i+$k]").mkString("||' '||")
    s"""WITH d AS (SELECT doc_id, text, $splitCase AS split FROM documents),
       |w AS (SELECT doc_id, split, regexp_split_to_array(trim(text), '\\s+') AS w FROM d),
       |g AS (SELECT doc_id, split, unnest(list_distinct(list_transform(
       |        range(greatest(len(w)-4, 0)), i -> $gram))) AS g FROM w),
       |t AS (SELECT DISTINCT g FROM g WHERE split IN ('val', 'test'))
       |SELECT g.doc_id AS doc_id, count(*) AS n_shared_grams
       |FROM g JOIN t USING (g) WHERE split = 'train' GROUP BY 1
       |""".stripMargin.replace("\n", " ")
  }

  val queries: Seq[QueryDef] = Seq(

    /** Benchmark decontamination: flag training-split documents sharing
      * any word 5-gram with the holdout (val ∪ test) splits — the
      * pretraining hygiene step that keeps eval data out of the training
      * set. Scale shape: both sides reduce to DISTINCT n-grams before
      * the join, so the join is keyed on grams and its work tracks
      * matches, not corpus size; the gram sets never ship documents.
      * (On a real corpus the holdout side is the published benchmark
      * suite — tiny and broadcastable; here it is derived from the q34
      * content-hash split so the gate can verify the full computation.) */
    QueryDef("q26_decontaminate", decontaminateOracle) { (s, dir) =>
      // both the holdout and train branches scan the session-shared
      // materialized gram table (b < 90 ⇔ train, ≥ 90 ⇔ val ∪ test) —
      // the 5-gram extraction pass runs once PER SESSION, not per query
      val grams = TextAnalysis.sharedDocGrams(s, dir)
      val holdout = grams.filter(col("b") >= 90).select("g").distinct()
      // per-doc gram lists are already distinct (wordShingles), so this
      // count is the number of DISTINCT shared grams per train doc
      grams.filter(col("b") < 90)
        .join(holdout, "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    },

    QueryDef("q39_curated_corpus", {
      val split =
        """CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
          |     WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
          |     ELSE 'test' END""".stripMargin
      s"""WITH RECURSIVE $clusterCtes,
         |losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
         |SELECT doc_id, $split AS split, ${TextAnalysis.qualityScoreSql} AS quality
         |FROM documents
         |WHERE ${TextAnalysis.qualityScoreSql} >= 0.5
         |  AND doc_id NOT IN (SELECT doc_id FROM losers)
         |""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      // quality filter FIRST: pure scan-side arithmetic, so low-quality
      // docs never reach the join
      val kept = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.5)

      // near-dup losers: every clustered doc except its cluster's
      // minimum (the survivor). Clusters come from the session-scoped
      // SHARED q36 cluster table over the FULL corpus — dedup must see
      // low-quality duplicates too, or a cluster could lose its survivor
      // to the quality filter and a duplicate would slip through with it.
      val losers = Dedup.sharedNearDupClusters(s, dir)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id")

      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      kept.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    /** q39's curated corpus with q151's QUALITY-AWARE survivors swapped
      * in — the composition production pipelines actually ship
      * (RefinedWeb/Dolma keep the best RENDERING of a duplicated page;
      * q39's min-id keeps whichever copy crawled first, often the
      * truncated or boilerplate-wrapped one). Per near-dup cluster the
      * survivor is the argmax member by (quality, −doc_id) — q151's
      * struct-max over the same session cluster memo — and every other
      * member is a loser; the quality floor and content-hash split are
      * q39's unchanged. A cluster whose best member fails the floor
      * contributes nothing (same as q39 when its min-id survivor
      * fails): dedup still sees low-quality duplicates, the FILTER is
      * what drops them.
      *
      * Shape at 100 TB: q39's plan plus one bounded cluster-keyed
      * argmax (map-side combinable — one struct per map partition per
      * cluster, never member lists) and a survivor broadcast back onto
      * the cluster table; everything is ∝ duplicate density except the
      * quality scan q39 already pays. */
    QueryDef("q153_quality_survivor_corpus", {
      val split =
        """CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
          |     WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
          |     ELSE 'test' END""".stripMargin
      s"""WITH RECURSIVE $clusterCtes,
         |cq AS (SELECT c.cluster_id, c.doc_id,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM clusters c JOIN documents USING (doc_id)),
         |surv AS (SELECT cluster_id,
         |    -((max(struct_pack(q := quality, negid := -doc_id))).negid)
         |      AS survivor_id
         |  FROM cq GROUP BY 1),
         |losers AS (SELECT cq.doc_id FROM cq JOIN surv USING (cluster_id)
         |  WHERE cq.doc_id <> surv.survivor_id)
         |SELECT doc_id, $split AS split,
         |  ${TextAnalysis.qualityScoreSql} AS quality
         |FROM documents
         |WHERE ${TextAnalysis.qualityScoreSql} >= 0.5
         |  AND doc_id NOT IN (SELECT doc_id FROM losers)
         |""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val kept = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.5)

      // quality-aware survivors over the session cluster memo: argmax
      // by (quality, -doc_id) per cluster (q151's rule), then losers =
      // every clustered doc except its cluster's survivor
      val clusters = Dedup.sharedNearDupClusters(s, dir)
      val quality = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val survivors = clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(max(struct(col("quality").as("q"),
          (-col("doc_id")).as("negid"))).as("m"))
        .select(col("cluster_id"), (-col("m.negid")).as("survivor_id"))
      // cluster-keyed join, NOT a forced broadcast: the cluster table is
      // duplicate-density-sized, which at 100 TB is still unbounded —
      // AQE may still broadcast when it measures small
      val losers = clusters.join(survivors, "cluster_id")
        .filter(col("doc_id") =!= col("survivor_id"))
        .select("doc_id")

      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      kept.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    /** ONE corpus, BOTH survivor policies (r11 VERDICT #7): q153's
      * quality-aware TEXT survivors composed with q154's best-RENDERING
      * MEDIA survivors — the full multimodal curation a LAION-style
      * pipeline ships, where a document must win its text near-dup
      * cluster (argmax quality) AND its media near-dup cluster (argmax
      * pixels) to stay in the corpus. The media net is cast WIDER than
      * q125/q154's (Hamming ≤ 5 via 8×4-bit bands — pigeonhole-complete
      * to radius 7; aggressive media dedup is the production posture,
      * and the banding geometry follows the radius), so this is also
      * the radius-parameterized banding's gate row. Quality floor and
      * content-hash split are q153's unchanged.
      *
      * Shape at 100 TB: q153's plan plus the media-loser anti-join —
      * clusters ∝ banded collisions, survivor argmax map-side
      * combinable, losers duplicate-density-sized; the wider radius
      * multiplies candidate pairs, never corpus passes. */
    QueryDef("q155_multimodal_corpus", {
      val split =
        """CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
          |     WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
          |     ELSE 'test' END""".stripMargin
      s"""WITH RECURSIVE $clusterCtes,
         |cq AS (SELECT c.cluster_id, c.doc_id,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM clusters c JOIN documents USING (doc_id)),
         |surv AS (SELECT cluster_id,
         |    -((max(struct_pack(q := quality, negid := -doc_id))).negid)
         |      AS survivor_id
         |  FROM cq GROUP BY 1),
         |losers AS (SELECT cq.doc_id FROM cq JOIN surv USING (cluster_id)
         |  WHERE cq.doc_id <> surv.survivor_id),
         |md AS (SELECT doc_id, text, length(text) AS L
         |    FROM documents WHERE length(text) >= 32),
         |mch AS (SELECT doc_id, L, CAST(u.p AS INT) AS p,
         |    unicode(substr(text, CAST(u.p AS INT) + 1, 1)) AS c
         |  FROM md, unnest(range(L)) AS u(p)),
         |mblk AS (SELECT doc_id, L, (p * 32) // L AS k,
         |    sum(c) AS s, count(*) AS n FROM mch GROUP BY 1, 2, 3),
         |mtot AS (SELECT doc_id, sum(s) AS st FROM mblk GROUP BY 1),
         |mbits AS (SELECT b.doc_id,
         |    CAST(sum(CASE WHEN b.s * b.L > t.st * b.n
         |        THEN (CAST(1 AS BIGINT) << CAST(b.k AS INT)) ELSE 0 END)
         |      AS BIGINT) AS h
         |  FROM mblk b JOIN mtot t USING (doc_id) GROUP BY 1),
         |mp AS (SELECT a.doc_id AS ma, b.doc_id AS mb
         |  FROM mbits a JOIN mbits b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.h, b.h)) <= 5),
         |medges AS (SELECT ma AS u, mb AS v FROM mp
         |  UNION SELECT mb, ma FROM mp
         |  UNION SELECT ma, ma FROM mp
         |  UNION SELECT mb, mb FROM mp),
         |mreach(u, v) AS (SELECT u, v FROM medges
         |  UNION SELECT r.u, e.v FROM mreach r JOIN medges e ON r.v = e.u),
         |mcl AS (SELECT u AS media_id, min(v) AS cluster_id
         |  FROM mreach GROUP BY u),
         |mpx AS (SELECT doc_id AS media_id,
         |    CASE WHEN doc_id % 3 < 2
         |      THEN ((doc_id % 64) * 16 + 16) * ((doc_id % 48) * 16 + 16)
         |      ELSE 0 END AS px
         |  FROM documents),
         |msurv AS (SELECT cluster_id,
         |    -((max(struct_pack(px := mpx.px, negid := -mcl.media_id))).negid)
         |      AS survivor_id
         |  FROM mcl JOIN mpx USING (media_id) GROUP BY 1),
         |mlosers AS (SELECT mcl.media_id AS doc_id
         |  FROM mcl JOIN msurv USING (cluster_id)
         |  WHERE mcl.media_id <> msurv.survivor_id)
         |SELECT doc_id, $split AS split,
         |  ${TextAnalysis.qualityScoreSql} AS quality
         |FROM documents
         |WHERE ${TextAnalysis.qualityScoreSql} >= 0.5
         |  AND doc_id NOT IN (SELECT doc_id FROM losers)
         |  AND doc_id NOT IN (SELECT doc_id FROM mlosers)
         |""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val kept = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.5)

      // text losers: q153's quality-argmax survivors over the session
      // cluster memo
      val clusters = Dedup.sharedNearDupClusters(s, dir)
      val quality = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val survivors = clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(max(struct(col("quality").as("q"),
          (-col("doc_id")).as("negid"))).as("m"))
        .select(col("cluster_id"), (-col("m.negid")).as("survivor_id"))
      val textLosers = clusters.join(survivors, "cluster_id")
        .filter(col("doc_id") =!= col("survivor_id"))
        .select("doc_id")

      // media losers: q154's max-pixels survivors at the wider radius
      val mediaLosers = Multimodal.mediaLosers(s, dir,
        maxHamming = 5, nBands = 8)

      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      kept.join(textLosers, Seq("doc_id"), "left_anti")
        .join(mediaLosers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    /** Deterministic WEIGHTED sampling per stratum — Efraimidis–Spirakis
      * (Inf. Proc. Letters 2006), THE one-pass distributed weighted
      * reservoir algorithm: each doc draws u ∈ (0,1] and the top-k by
      * u^(1/w) per stratum are an exact weighted-without-replacement
      * sample. The curation use: pull k inspection/eval docs per source
      * with probability ∝ token count, reproducibly. Determinism: u is
      * md5-derived from the doc id (the signature posture — any engine
      * replays the draw), and the rank key is the monotone-equivalent
      * ln(u)/w (same ordering, no pow), rounded to 6 BEFORE ranking with
      * the id tie-break so a last-ulp ln() divergence cannot flip a rank
      * (the q42/q99 argmax discipline; ln joins sqrt/divide as the only
      * shared double ops, on equal inputs). Zero-token docs carry no
      * weight and are excluded on both engines.
      *
      * Shape at 100 TB: ONE corpus scan into a bounded
      * [[graft.functions.TopKAggregator]] buffer per stratum (map-side
      * combinable — each partition ships ≤ k rows per source, never the
      * corpus; no window sort anywhere). This plan IS the textbook
      * distributed E-S implementation. A streaming twin would make the
      * STRATUM the retraction unit (a delete inside the sample needs
      * the stratum's (k+1)th key — the BestQuality-frontier tradeoff),
      * which is why the batch form is the one pipelines schedule. */
    QueryDef("q156_weighted_sample",
      s"""WITH w AS (SELECT source, doc_id,
         |    ${graft.operators.Provenance.tokenCountSql("text")} AS n_tok
         |  FROM documents),
         |u AS (SELECT source, doc_id,
         |    (CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8))
         |       AS BIGINT) % 1000000 + 1) / 1000000.0 AS uv,
         |    n_tok
         |  FROM w WHERE n_tok > 0),
         |k AS (SELECT source, doc_id, round(ln(uv) / n_tok, 6) AS smp_key
         |  FROM u),
         |r AS (SELECT source, doc_id, smp_key,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY smp_key DESC, doc_id) AS rk
         |  FROM k)
         |SELECT source, doc_id, smp_key, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 5""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val nTok = graft.operators.Provenance.tokenCount(col("text"))
      val uv = (pmod(
        conv(substring(md5(concat(lit("smp|"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long"), lit(1000000L)) + 1) / lit(1000000.0)
      val topk = udaf(new graft.functions.TopKAggregator(5))
      t(s, dir, "documents")
        .filter(nTok > 0)
        .select(col("source"), col("doc_id"),
          round(log(uv) / nTok, 6).as("smp_key"))
        .groupBy("source")
        .agg(topk(col("smp_key"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"),
          col("col.score").as("smp_key"),
          (col("pos") + 1).cast("long").as("rk"))
    },

    /** Shared-CHUNK detection over overlapping token windows — the
      * chunk-granular form of boilerplate/dedup a RAG or long-context
      * pipeline runs after document-level passes: documents are cut
      * into 32-token windows at stride 24 (8-token overlap, the
      * standard chunking shape), each full window fingerprinted by md5
      * of its joined tokens, and a fingerprint appearing in MORE THAN
      * ONE document is shared content (navigation, license blocks,
      * templated paragraphs) with its occurrence and document counts
      * and earliest carrier. Tail windows shorter than 32 tokens are
      * not emitted — a partial window's hash would never match its
      * full-width twin, so they only add noise (both engines state the
      * same floor).
      *
      * Shape at 100 TB: the window explode is a generator (∝ tokens/24
      * per doc, no shuffle), the rollup shuffles 16-byte hashes with
      * map-side partial aggregation, and the >1-doc filter drops the
      * unique-chunk mass before anything wide moves. md5 fingerprints
      * are the cross-engine replay posture. */
    QueryDef("q157_chunk_dedup",
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |    md5(array_to_string(w[CAST(i * 24 + 1 AS BIGINT) :
        |                          CAST(i * 24 + 32 AS BIGINT)], ' ')) AS chunk_hash
        |  FROM d, unnest(range((greatest(len(w) - 32, -24) // 24) + 1)) AS u(i)
        |  WHERE len(w) >= 32)
        |SELECT chunk_hash,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) > 1"""
        .stripMargin.replace("\n", " ")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(chunkHashes(col("text"))).as("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occ"),
          min("doc_id").as("first_doc"))
        .filter(col("n_docs") > 1)
    },

    /** Span-REMOVAL decontamination — q26 locates contaminated training
      * documents; this operator goes the step further real pipelines
      * take (the GPT-3/PaLM decontamination recipe): cut the overlapping
      * token spans out and keep the rest of the document. Every
      * contaminated 5-gram at token position i covers positions
      * i..i+4; the cleaned text is the positional anti-join of the
      * doc's tokens against that cover, reassembled in order. No
      * interval-merge pass is needed: overlapping spans union naturally
      * through the DISTINCT covered-position set. Shape at scale: grams
      * carry positions through the (gram-keyed) contamination join; the
      * cover explode is 5× the contaminated-hit count — bounded by
      * contamination density, not corpus size; the rebuild groups each
      * affected doc's own tokens (affected docs only — the anti-join
      * output is filtered to docs with a nonzero cover). */
    QueryDef("q87_decontaminate_spans", {
      val splitCase =
        """CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
          |     WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
          |     ELSE 'test' END""".stripMargin
      val gram = (0 to 4).map(k => s"w[i+$k]").mkString("||' '||")
      s"""WITH d AS (SELECT doc_id, $splitCase AS split,
         |      regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |tok AS (SELECT doc_id, split, unnest(w) AS tok,
         |      generate_subscripts(w, 1) AS pos FROM d),
         |g AS (SELECT doc_id, split, i AS start, $gram AS gram
         |  FROM d, unnest(range(1, greatest(len(w) - 3, 1))) AS u(i)),
         |hold AS (SELECT DISTINCT gram FROM g WHERE split IN ('val', 'test')),
         |cover AS (SELECT DISTINCT g.doc_id, g.start + k AS pos
         |  FROM g JOIN hold USING (gram), unnest(range(0, 5)) AS u(k)
         |  WHERE g.split = 'train'),
         |removed AS (SELECT doc_id, count(*) AS n_removed FROM cover GROUP BY 1),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
         |  JOIN removed USING (doc_id)
         |  LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |  WHERE c.pos IS NULL)
         |SELECT r.doc_id, r.n_removed,
         |  coalesce(k.cleaned_text, '') AS cleaned_text
         |FROM removed r LEFT JOIN (SELECT doc_id,
         |    string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
         |  FROM kept GROUP BY doc_id) k USING (doc_id)
         |""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      // r13 opt: d feeds the token explode AND the gram explode (each a
      // heavy single-split scan on the bench corpus) — persist so the
      // split() scan runs once; grams feeds the holdout build (a
      // broadcast side) and the train cover — eager, or the broadcast
      // thread races the lazy cache (q102 lesson). r14 (guide §2.4, the
      // q37 move): the spread is a doc_id hash repartition — the cached
      // d is then already clustered for cover's (doc_id, pos) distinct,
      // the removal groupBy, the keep joins and the rebuild groupBy, so
      // the whole doc-keyed tail runs with no further exchange (the
      // gram side stays broadcast-joined).
      val d = graft.CacheScope.persist(t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"),
          split(trim(col("text")), "\\s+").as("w")))
      val toks = d.select(col("doc_id"), col("split"),
          posexplode(col("w")).as(Seq("p0", "tok")))
        .select(col("doc_id"), col("split"), (col("p0") + 1).as("pos"),
          col("tok"))
      // positional 5-grams: start is 1-based, like the oracle's subscripts
      val n = size(col("w"))
      val grams = graft.CacheScope.eager(
        d.select(col("doc_id"), col("split"),
          posexplode(when(n >= 5,
            transform(sequence(lit(1), n - 4), i =>
              concat_ws(" ", (0 to 4).map(k =>
                element_at(col("w"), i + k)): _*)))
            .otherwise(array().cast("array<string>")))
            .as(Seq("i0", "gram")))
        .select(col("doc_id"), col("split"), (col("i0") + 1).as("start"),
          col("gram")))
      val hold = grams.filter(col("split").isin("val", "test"))
        .select("gram").distinct()
      // r14: cover feeds the removal count AND the keep anti-join, and
      // `removed` (derived from it) broadcast-joins — unpersisted, the
      // broadcast thread re-ran the gram⋈holdout join; eager runs it once
      val cover = graft.CacheScope.eager(grams
        .filter(col("split") === "train")
        .join(hold, "gram")
        .select(col("doc_id"),
          explode(sequence(col("start"), col("start") + 4)).as("pos"))
        .distinct())
      val removed = cover.groupBy("doc_id")
        .agg(count(lit(1)).as("n_removed"))
      val kept = toks.join(removed.select("doc_id"), "doc_id")
        .join(cover, Seq("doc_id", "pos"), "left_anti")
      val rebuilt = kept.groupBy("doc_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok")), " ").as("cleaned_text"))
      removed.join(rebuilt, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_removed"),
          coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
    },

    /** Temperature-flattened source-mixture weights — the corpus-mixing
      * step before training: per (lang, source) stratum, sampling
      * weight ∝ (token share)^0.5, i.e. α = 0.5 temperature sampling
      * (the multilingual-pretraining recipe: upweight small sources,
      * damp dominant ones). Since weightᵢ = √shareᵢ / Σ√shareⱼ and the
      * corpus total cancels, the computation is √n_tokᵢ normalized by
      * Σ√n_tokⱼ — no global token count needed. Shape at scale: one
      * map-side-combinable groupBy over (lang, source) — the stratum
      * frame is bounded metadata like centroids — then a 1-row
      * broadcast for the normalizer. Determinism: sqrt is
      * IEEE-correctly-rounded (unlike pow/ln), each √n_tok is rounded
      * to 9 and summed as DECIMAL(18,9) — exact, order-independent —
      * and the final weight is one double division. */
    QueryDef("q90_source_mixture", {
      s"""WITH st AS (SELECT lang, source,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tok
         |  FROM documents GROUP BY 1, 2),
         |sq AS (SELECT lang, source, n_tok,
         |    CAST(round(sqrt(n_tok), 9) AS DECIMAL(18,9)) AS sq FROM st),
         |tot AS (SELECT sum(sq) AS ts FROM sq)
         |SELECT lang, source, n_tok,
         |  round(CAST(sq AS DOUBLE) / CAST(ts AS DOUBLE), 6) AS weight
         |FROM sq CROSS JOIN tot""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val st = t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tok"))
      val sq = st.select(col("lang"), col("source"), col("n_tok"),
        round(sqrt(col("n_tok")), 9).cast("decimal(18,9)").as("sq"))
      val tot = sq.agg(sum("sq").as("ts"))
      sq.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_tok"),
          round(col("sq").cast("double") / col("ts").cast("double"), 6)
            .as("weight"))
    },

    /** PII redaction: count and mask emails / phone numbers / IPv4
      * addresses — the privacy-scrub step a training corpus passes
      * through before tokenization. The synthetic corpus contains no
      * PII, so each document first gets a deterministic doc_id-derived
      * contact tail appended (emails on doc_id%7==0, phones on %5==0,
      * IPs on %3==0 — the oracle runs the same derivation, the q50/q51
      * payload-construction precedent), and the operator under test is
      * the scrub itself: per-class match counts plus an md5 signature
      * of the redacted text, which hash-pins byte-identical masking
      * across engines. Patterns stay inside the Java-regex ∩ RE2
      * common subset so Spark and DuckDB agree; replacement order
      * (email → phone → IP) is safe because each mask token contains
      * no digits and the classes cannot overlap textually.
      *
      * Scale shape: one narrow per-row map — the counts, replaces and
      * signature all fuse into whole-stage codegen at the scan; no
      * shuffle, no UDF (`PlanSpec` pins the exchange-free plan). */
    QueryDef("q93_pii_redact", {
      s"""WITH a AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 7 = 0 THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |  CASE WHEN doc_id % 5 = 0 THEN ' 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
         |  CASE WHEN doc_id % 3 = 0 THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$EmailPat')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '$PhonePat')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(aug, '$IpPat')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$EmailPat', '<EMAIL>', 'g'), '$PhonePat', '<PHONE>', 'g'),
         |    '$IpPat', '<IP>', 'g')) AS clean_sig
         |FROM a""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val id = col("doc_id")
      val aug = concat(col("text"),
        when(id % 7 === 0,
          concat(lit(" user"), id.cast("string"), lit("@example.com")))
          .otherwise(""),
        when(id % 5 === 0,
          concat(lit(" 555-"), lpad((id % 10000).cast("string"), 4, "0")))
          .otherwise(""),
        when(id % 3 === 0,
          concat(lit(" 10.0."), (id % 256).cast("string"), lit("."),
            (id % 250).cast("string")))
          .otherwise(""))
      t(s, dir, "documents").select(id +: piiColumns(aug): _*)
    },

    /** Corpus-adaptive boilerplate vocabulary: tokens present in more
      * than 90% of a source's documents are that source's boilerplate
      * (navigation chrome, legal footers, template filler — the
      * per-site analogue of a stopword list, learned from the corpus
      * instead of hardcoded). Emits each document's token count, its
      * boilerplate-token count against its own source's vocabulary,
      * and the resulting content ratio — the signal the curation
      * filter uses to drop chrome-dominated pages.
      *
      * Scale shape: document frequency is one agg keyed by
      * (source, token) — work ∝ distinct vocabulary per source, never
      * pairwise; the learned vocabulary (df > 0.9·|source|) is tiny by
      * construction and BROADCAST back onto the per-doc token counts,
      * so the only wide ops are vocabulary-sized aggregations. */
    QueryDef("q94_boilerplate", {
      """WITH tok AS (SELECT doc_id, source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
        |nd AS (SELECT source, count(DISTINCT doc_id) AS ndocs FROM tok GROUP BY 1),
        |df AS (SELECT source, tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1, 2),
        |b AS (SELECT df.source, df.tok FROM df JOIN nd USING (source)
        |  WHERE df * 1.0 > 0.9 * ndocs),
        |cnt AS (SELECT doc_id, source, tok, count(*) AS c FROM tok GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CASE WHEN b.tok IS NOT NULL THEN c END), 0) AS BIGINT) AS n_boiler,
        |  round(1.0 - coalesce(sum(CASE WHEN b.tok IS NOT NULL THEN c END), 0) * 1.0 / sum(c), 6) AS content_ratio
        |FROM cnt LEFT JOIN b ON cnt.source = b.source AND cnt.tok = b.tok
        |GROUP BY doc_id""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      // r14 (was r13 eager(tok) + three concurrent aggregation passes
      // over the cached token table): every statistic derives from the
      // FINEST aggregation. cnt (one row per distinct (doc, source,
      // tok)) is computed once from the token stream — the explode is
      // consumed exactly once, no token-table persist at all; df reads
      // off cnt (a (source,tok)'s distinct-doc count is its cnt row
      // count, since each doc has one source); nd is docs-per-source
      // straight from the corpus (every document yields ≥1 token row:
      // split of an empty text is ['']). Three corpus-token passes and
      // two countDistincts become one token pass plus two bounded
      // aggregations.
      // (and r14 again: the pre-explode shuffle is doc_id-keyed, so the
      // (doc, source, tok) aggregation and the final per-doc rollup both
      // reuse it — only df's (source, tok) aggregate re-keys)
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("source"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
      val cnt = graft.CacheScope.eager(
        tok.groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("c")))
      val nd = t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("ndocs"))
      val df = cnt.groupBy("source", "tok").agg(count(lit(1)).as("df"))
      val boiler = df.join(broadcast(nd), "source")
        .filter(col("df") * 1.0 > lit(0.9) * col("ndocs"))
        .select(col("source"), col("tok"), lit(1).as("is_b"))
      val boilerC = sum(when(col("is_b").isNotNull, col("c")))
      cnt.join(broadcast(boiler), Seq("source", "tok"), "left")
        .groupBy("doc_id")
        .agg(sum("c").cast("long").as("n_tokens"),
          coalesce(boilerC, lit(0)).cast("long").as("n_boiler"),
          round(lit(1.0) -
            coalesce(boilerC, lit(0)).cast("double") / sum(col("c")), 6)
            .as("content_ratio"))
    },

    /** FUZZY decontamination: train-split documents near-duplicate
      * (jaccard ≥ 0.8 on word 3-shingles) to any holdout document —
      * the leakage q26's exact 5-gram overlap is structurally blind to
      * (a lightly paraphrased eval document shares few exact 5-grams
      * but high shingle jaccard). Composes the q21 banded-LSH pair
      * machinery with the q34 content-hash split: candidates come from
      * the banding (∝ true near-dups, never n² — the oracle may go
      * all-pairs, the engine must not), and only cross-split verified
      * pairs survive. Output keys the TRAIN side with its holdout
      * near-dup count and the maximum verified similarity. */
    QueryDef("q100_fuzzy_decontaminate", {
      """WITH w AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 AS train,
        |    list_distinct(list_transform(range(greatest(len(w)-2,0)),
        |      i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS sh FROM w),
        |p AS (SELECT a.doc_id AS da, a.train AS ta, b.doc_id AS db, b.train AS tb,
        |    len(list_intersect(a.sh, b.sh)) * 1.0 /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE len(a.sh) > 0 AND len(b.sh) > 0 AND len(list_intersect(a.sh, b.sh)) * 1.0 /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        |c AS (SELECT CASE WHEN ta THEN da ELSE db END AS doc_id, round(j, 6) AS jac
        |  FROM p WHERE ta <> tb)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_holdout_neardups,
        |  max(jac) AS max_jaccard
        |FROM c GROUP BY doc_id""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), (bucket < 90).as("train"), col("text"))
      val tags = docs.select("doc_id", "train")
      Dedup.sharedNearDupPairs(s, dir)
        .join(tags.select(col("doc_id").as("doc_a"), col("train").as("ta")),
          "doc_a")
        .join(tags.select(col("doc_id").as("doc_b"), col("train").as("tb")),
          "doc_b")
        .filter(col("ta") =!= col("tb"))
        .select(when(col("ta"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_id"),
          round(col("jaccard"), 6).as("jac"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_holdout_neardups"),
          max("jac").as("max_jaccard"))
    },

    /** DSIR — data selection by importance resampling (Xie et al. 2023,
      * arXiv:2302.03169): score every raw document by how much its
      * hashed-n-gram profile looks like a TARGET domain vs the raw pool,
      * log w(x) = Σ_f c_f(x)·(ln p̂_target[f] − ln p̂_raw[f]) over
      * hashed word-bigram features. The target here is the English
      * slice (stand-in for "looks like Wikipedia" — any labeled subset
      * plugs in); docs ranked by log-weight are what importance
      * resampling would then sample ∝ exp(logw).
      *
      * Shape at 100 TB: the feature space is HASHED to 1024 buckets, so
      * both distribution estimates are bounded aggregates however large
      * the corpus (map-side-combined (bucket, count) partials), the
      * log-ratio table broadcasts, and scoring is one broadcast join on
      * the per-doc bucket counts — one corpus-wide shuffle total, on
      * (doc_id, bucket). FP discipline: each log-ratio is rounded to 6
      * and summed per doc as count×DECIMAL — exact, order-independent
      * (the q85/q88 lesson); the md5 bucket hash is the engine-portable
      * one q34/q85 use. Docs with <2 words have no bigram features and
      * are absent by construction (the q88 posture). */
    QueryDef("q102_dsir_importance", {
      val hb = "CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 1024"
      s"""WITH w AS (SELECT doc_id, lang,
         |    regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |bg AS (SELECT doc_id, lang, unnest(list_transform(
         |    range(greatest(len(w)-1, 0)), i -> w[i+1] || ' ' || w[i+2])) AS g
         |  FROM w),
         |dc AS (SELECT doc_id, lang, $hb AS b, CAST(count(*) AS BIGINT) AS c
         |  FROM bg GROUP BY 1, 2, 3),
         |rf AS (SELECT b, sum(c) AS rc FROM dc GROUP BY 1),
         |tf AS (SELECT b, sum(c) AS tc FROM dc WHERE lang = 'en' GROUP BY 1),
         |tot AS (SELECT (SELECT sum(rc) FROM rf) AS rn,
         |               (SELECT coalesce(sum(tc), 0) FROM tf) AS tn),
         |lam AS (SELECT rf.b,
         |    CAST(round(ln((coalesce(tf.tc, 0) + 1.0) / (tot.tn + 1024.0))
         |             - ln((rf.rc + 1.0) / (tot.rn + 1024.0)), 6)
         |         AS DECIMAL(18,6)) AS lam
         |  FROM rf LEFT JOIN tf ON rf.b = tf.b CROSS JOIN tot)
         |SELECT dc.doc_id, CAST(sum(dc.c * lam.lam) AS DOUBLE) AS logw
         |FROM dc JOIN lam ON dc.b = lam.b GROUP BY 1""".stripMargin
        .replace("\n", " ")
    }) { (s, dir) =>
      // r13 opt: (1) the md5-per-bigram feature pass previously ran on
      // ONE task (single-row-group bench corpus) — Tables.spread
      // parallelizes it adaptively; (2) dc is EAGER-persisted: its
      // consumers include broadcast subqueries, and with a lazy persist
      // the broadcast threads raced the cache and each recomputed the
      // md5+explode lineage (measured 5× duplicated stages at sf0.1);
      // (3) the raw-pool and target bucket distributions are ONE
      // conditional aggregation instead of two separate passes over dc,
      // and the normalizers come off that 1024-row frame instead of
      // re-aggregating dc — two corpus-scale passes and a join removed,
      // identical integer sums (guide §2.3/§2.4).
      // r14 (guide §2.4, the q37 move): hash-repartition by doc_id
      // instead of round-robin spread — the same shuffle then satisfies
      // the (doc_id, lang, b) aggregation AND the final per-doc rollup,
      // so both run with no further exchange.
      val dc = graft.CacheScope.eager(
        t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.NGrams.wordGrams(col("text"), 2)).as("g"))
        .select(col("doc_id"), col("lang"),
          pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
            lit(1024L)).as("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(count(lit(1)).as("c")))
      // r14: buckets (≤1024 rows) feeds tot AND the broadcast lam —
      // unpersisted, the bucket aggregation over dc ran twice (once per
      // consumer, the second on a broadcast thread); eager runs it once
      val buckets = graft.CacheScope.eager(
        dc.groupBy("b").agg(sum("c").as("rc"),
          sum(when(col("lang") === "en", col("c"))).as("tc")))
      val tot = buckets.agg(sum("rc").as("rn"),
        coalesce(sum("tc"), lit(0L)).as("tn"))
      val lam = buckets
        .crossJoin(broadcast(tot))
        .select(col("b"),
          round(log((coalesce(col("tc"), lit(0L)) + 1.0) / (col("tn") + 1024.0))
              - log((col("rc") + 1.0) / (col("rn") + 1024.0)), 6)
            .cast("decimal(18,6)").as("lam"))
      dc.join(broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(sum(col("c") * col("lam")).cast("double").as("logw"))
    },

    /** Per-source document cap — the RefinedWeb/C4-style guard against
      * one domain flooding the corpus: keep the top 10 documents per
      * source by quality score (ties → lower doc_id), emitting the kept
      * rows with their rank. Deliberately NOT a `row_number()` window:
      * a window partitioned by source sorts each source's ENTIRE doc
      * set in one task — the hot-domain hazard at 100 TB. The bounded
      * [[graft.functions.TopKAggregator]] keeps ≤ 10 entries per source
      * IN THE AGGREGATION BUFFER, so partial aggregation ships 10 rows
      * per map partition per source and a 10-million-doc domain costs
      * the same shuffle as a 10-doc one. The oracle states the same
      * semantics the declarative way (row_number ≤ 10). */
    QueryDef("q109_domain_cap",
      s"""WITH q AS (SELECT source, doc_id,
         |    ${TextAnalysis.qualityScoreSql} AS quality FROM documents),
         |r AS (SELECT source, doc_id, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id) AS rk
         |  FROM q)
         |SELECT source, doc_id, quality, rk FROM r WHERE rk <= 10"""
        .stripMargin.replace("\n", " ")) { (s, dir) =>
      val topk = udaf(new graft.functions.TopKAggregator(10))
      t(s, dir, "documents")
        .select(col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          col("doc_id"))
        .groupBy("source")
        .agg(topk(col("quality"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"),
          col("col.score").as("quality"),
          (col("pos") + 1).cast("long").as("rk"))
        .select("source", "doc_id", "quality", "rk")
    },

    /** DoReMi-style mixture reweighting (Xie et al. 2023,
      * arXiv:2305.10429 — Group-DRO over domain weights): starting
      * uniform, run 5 rounds of the multiplicative-weights update
      * w ← w·exp(η·(L(s) − Σ w·L)) / Z with η = 0.1, where L(s) is the
      * per-source mean held-out-LM score ([[TextAnalysis.lmDocScores]],
      * q88's model standing in for the paper's proxy-model loss).
      * Sources whose text the clean-subset LM finds hard gain weight —
      * the excess-loss-seeking behavior of the paper — while the
      * mixture-average anchor keeps the update from collapsing onto the
      * single worst domain. Output: per-source doc count, loss, and the
      * round-5 weight.
      *
      * Shape at scale: one corpus-wide pass (the LM score) feeding a
      * SOURCE-keyed aggregate; the 5 rounds then run on the DRIVER over
      * the collected per-source table — bounded model metadata (DoReMi's
      * domain set is ~22 groups; the KMeans-centroid/BPE-argmax collect
      * precedent), NOT corpus data. A first cut iterated as chained
      * DataFrame rounds instead: each round references its predecessor
      * twice (mixture average + directly), and even with per-round
      * persists the growing lineage cost ~55 s/run in plan bookkeeping
      * for what is 20 rows of arithmetic — the wrong side of the
      * driver/cluster split. Cross-engine FP: every per-round quantity
      * is rounded to 6 and carried exactly (BigDecimal here,
      * DECIMAL(18,6) in the oracle) — per-source loss, the exact Σ w·L
      * mixture average, the exp term and the renormalized weight — so
      * both engines iterate on IDENTICAL values and the only
      * cross-engine ops are double exp/divide on equal inputs. */
    QueryDef("q111_doremi_weights", {
      // every CTE is MATERIALIZED: each round references its
      // predecessor more than once, and inlining would re-evaluate the
      // whole LM chain exponentially (the Bpe.bpeCtes lesson)
      val rounds = (1 to 5).map { t =>
        val p = s"w${t - 1}"
        s"""a$t AS MATERIALIZED (SELECT CAST(sum(w * loss) AS DOUBLE) AS m FROM $p),
           |e$t AS MATERIALIZED (SELECT source, n_docs, loss,
           |    CAST(round(CAST(w AS DOUBLE) *
           |      exp(0.1 * (CAST(loss AS DOUBLE) - a$t.m)), 6)
           |      AS DECIMAL(18,6)) AS ew
           |  FROM $p, a$t),
           |z$t AS MATERIALIZED (SELECT sum(ew) AS z FROM e$t),
           |w$t AS MATERIALIZED (SELECT source, n_docs, loss,
           |    CAST(round(CAST(ew AS DOUBLE) / CAST(z$t.z AS DOUBLE), 6)
           |      AS DECIMAL(18,6)) AS w
           |  FROM e$t, z$t)""".stripMargin
      }.mkString(",\n")
      s"""${TextAnalysis.lmScoreCtes},
         |dl AS MATERIALIZED (SELECT d.source, count(*) AS n_docs,
         |    CAST(round(CAST(sum(CAST(lm.avg_nll AS DECIMAL(18,6)))
         |      AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS loss
         |  FROM lm JOIN documents d USING (doc_id) GROUP BY 1),
         |ns AS MATERIALIZED (SELECT count(*) AS n FROM dl),
         |w0 AS MATERIALIZED (SELECT source, n_docs, loss,
         |    CAST(round(1.0 / ns.n, 6) AS DECIMAL(18,6)) AS w
         |  FROM dl, ns),
         |$rounds
         |SELECT source, n_docs, CAST(loss AS DOUBLE) AS loss,
         |  CAST(w AS DOUBLE) AS weight FROM w5"""
        .stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      import java.math.{BigDecimal => JBD, RoundingMode}
      def r6(x: Double): JBD =
        new JBD(x).setScale(6, RoundingMode.HALF_UP)
      // the only distributed work: corpus-wide LM scores → per-source
      // (n_docs, loss); one bounded collect (one row per source)
      val rows = TextAnalysis.lmDocScores(s, dir)
        .join(t(s, dir, "documents").select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("avg_nll").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).cast("decimal(18,6)").as("loss"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      val n = rows.length
      var w: IndexedSeq[JBD] = IndexedSeq.fill(n)(r6(1.0 / n))
      for (_ <- 1 to 5) {
        val m = rows.indices.map(i => w(i).multiply(rows(i)._3))
          .reduce(_.add(_)).doubleValue // exact decimal Σ w·L, one cast
        val ew = rows.indices.map(i => r6(w(i).doubleValue *
          math.exp(0.1 * (rows(i)._3.doubleValue - m))))
        val z = ew.reduce(_.add(_)).doubleValue
        w = ew.map(e => r6(e.doubleValue / z))
      }
      import s.implicits._
      rows.indices.map(i => (rows(i)._1, rows(i)._2,
          rows(i)._3.doubleValue, w(i).doubleValue))
        .toDF("source", "n_docs", "loss", "weight")
    },

    /** The FULL pretraining-corpus build as ONE composed
      * materialization — the six-stage pipeline a corpus operator
      * actually ships, each stage an operator this engine gates
      * standalone: (1) Gopher gates (q107) decide admission; (2) exact
      * dedup (q20's rule) and (3) near-dup survivor selection (q36's
      * shared cluster table) both run over the FULL corpus — dedup must
      * see gated-out and held-out duplicates, or a cluster could lose
      * its survivor to a filter and smuggle a duplicate through (the
      * q39 lesson, applied twice); (4) decontamination drops candidate
      * train docs sharing any word-5-gram with the held-out content-hash
      * splits (q26/q34 composed — the GPT-3 recipe against the
      * pipeline's OWN eval splits); (5) the per-source cap (q109's
      * bounded TopKAggregator) ranks what remains by quality; (6) the
      * emitted rows carry the PII-redaction signature (q93) of their
      * text. Stage shapes are each argued at their standalone operator;
      * the composition adds one semi/anti join per stage, all keyed by
      * doc_id, and reuses the session-scoped cluster memo — no stage
      * rescans another stage's work. */
    QueryDef("q115_pipeline_corpus", {
      val splitB = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100"
      val gram5 = (1 to 5).map(k => s"w.w[i+$k]").mkString("||' '||")
      s"""WITH RECURSIVE $clusterCtes,
         |gate AS (${TextAnalysis.gopherGateSql}),
         |spl AS (SELECT doc_id, $splitB AS b FROM documents),
         |sig AS (SELECT doc_id, md5(text) AS sig FROM documents),
         |ek AS (SELECT sig, min(doc_id) AS keep_id FROM sig GROUP BY 1),
         |exact_losers AS (SELECT s2.doc_id FROM sig s2 JOIN ek USING (sig)
         |  WHERE s2.doc_id <> ek.keep_id),
         |near_losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
         |g AS (SELECT w.doc_id, unnest(list_distinct(list_transform(
         |    range(greatest(len(w.w)-4, 0)), i -> $gram5))) AS g FROM w),
         |hold AS (SELECT DISTINCT g.g FROM g JOIN spl USING (doc_id)
         |  WHERE spl.b >= 90),
         |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN hold USING (g)),
         |surv AS (SELECT d.doc_id, d.source,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM documents d JOIN gate USING (doc_id) JOIN spl USING (doc_id)
         |  WHERE gate.keep AND spl.b < 90
         |    AND d.doc_id NOT IN (SELECT doc_id FROM exact_losers)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM near_losers)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)),
         |r AS (SELECT source, doc_id, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id) AS rk
         |  FROM surv)
         |SELECT r.source, r.doc_id, r.quality, r.rk,
         |  md5(regexp_replace(regexp_replace(regexp_replace(d.text,
         |    '$EmailPat', '<EMAIL>', 'g'), '$PhonePat', '<PHONE>', 'g'),
         |    '$IpPat', '<IP>', 'g')) AS clean_sig
         |FROM r JOIN documents d USING (doc_id) WHERE rk <= 10"""
        .stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      val gate = TextAnalysis.gopherRules(
          docs.select(col("doc_id"), col("text")), col("doc_id"))
        .filter(col("keep")).select("doc_id")
      val sigs = docs.select(col("doc_id"), md5(col("text")).as("sig"))
      val exactLosers = sigs
        .join(sigs.groupBy("sig").agg(min("doc_id").as("keep_id")), "sig")
        .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
      val nearLosers = Dedup.sharedNearDupClusters(s, dir)
        .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      val grams = TextAnalysis.sharedDocGrams(s, dir)
      val hold = grams.filter(col("b") >= 90).select("g").distinct()
      val contaminated = grams.join(hold, "g").select("doc_id").distinct()
      val surv = docs.filter(bucket < 90)
        .join(gate, Seq("doc_id"), "left_semi")
        .join(exactLosers, Seq("doc_id"), "left_anti")
        .join(nearLosers, Seq("doc_id"), "left_anti")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          col("doc_id"))
      val topk = udaf(new graft.functions.TopKAggregator(10))
      surv.groupBy("source")
        .agg(topk(col("quality"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"),
          col("col.score").as("quality"),
          (col("pos") + 1).cast("long").as("rk"))
        .join(docs.select(col("doc_id"),
          md5(piiRedact(col("text"))).as("clean_sig")), "doc_id")
        .select("source", "doc_id", "quality", "rk", "clean_sig")
    },

    /** The pipeline FUNNEL — per-stage survivor counts for the composed
      * corpus build (q115), the "where did my tokens go" report every
      * dataset paper publishes (RefinedWeb/FineWeb/Dolma all tabulate
      * exactly this attrition chain): total → train split → Gopher
      * admission → exact-dedup survivors → near-dup survivors →
      * decontaminated → capped output. Every stage count is a semi/anti
      * join off the SAME stage frames q115 ships (and the same session
      * memos — cluster table, gram table), so the funnel costs a
      * count() per stage over already-priced plans; all outputs are
      * exact integers, no FP discipline needed. */
    QueryDef("q121_pipeline_funnel", {
      val splitB = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100"
      val gram5 = (1 to 5).map(k => s"w.w[i+$k]").mkString("||' '||")
      s"""WITH RECURSIVE $clusterCtes,
         |gate AS (${TextAnalysis.gopherGateSql}),
         |spl AS (SELECT doc_id, $splitB AS b FROM documents),
         |sig AS (SELECT doc_id, md5(text) AS sig FROM documents),
         |ek AS (SELECT sig, min(doc_id) AS keep_id FROM sig GROUP BY 1),
         |exact_losers AS (SELECT s2.doc_id FROM sig s2 JOIN ek USING (sig)
         |  WHERE s2.doc_id <> ek.keep_id),
         |near_losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
         |g AS (SELECT w.doc_id, unnest(list_distinct(list_transform(
         |    range(greatest(len(w.w)-4, 0)), i -> $gram5))) AS g FROM w),
         |hold AS (SELECT DISTINCT g.g FROM g JOIN spl USING (doc_id)
         |  WHERE spl.b >= 90),
         |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN hold USING (g)),
         |tr AS (SELECT doc_id FROM spl WHERE b < 90),
         |adm AS (SELECT doc_id FROM tr JOIN gate USING (doc_id) WHERE gate.keep),
         |s1 AS (SELECT doc_id FROM adm
         |  WHERE doc_id NOT IN (SELECT doc_id FROM exact_losers)),
         |sn AS (SELECT doc_id FROM s1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)),
         |sd AS (SELECT doc_id FROM sn
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |fin AS (SELECT count(*) AS n FROM (
         |  SELECT row_number() OVER (PARTITION BY d.source
         |    ORDER BY ${TextAnalysis.qualityScoreSql} DESC, d.doc_id) AS rk
         |  FROM sd JOIN documents d USING (doc_id)) WHERE rk <= 10)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_total,
         |  (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train,
         |  (SELECT CAST(count(*) AS BIGINT) FROM adm) AS n_admitted,
         |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_after_exact,
         |  (SELECT CAST(count(*) AS BIGINT) FROM sn) AS n_after_near,
         |  (SELECT CAST(count(*) AS BIGINT) FROM sd) AS n_after_decon,
         |  (SELECT CAST(n AS BIGINT) FROM fin) AS n_final"""
        .stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      // r14: the funnel previously materialized every stage as its own
      // persisted doc_id frame (5 chained anti-joins) and counted all
      // six via concurrent broadcast count subqueries — 40+ sequential
      // jobs of scheduling for seven integers, and each stage's shuffle
      // re-keyed the SAME doc ids. A semi/anti join on a unique key is
      // a boolean flag: one pass left-joins the loser/admission sets
      // onto the corpus, every funnel count reads off that frame in ONE
      // aggregation, and the per-source top-10 tail reuses the same
      // cached rows (its quality column rides the pass). Identical
      // integers — membership logic is unchanged, join keys are unique.
      val gate = TextAnalysis.gopherRules(
          docs.select(col("doc_id"), col("text")), col("doc_id"))
        .filter(col("keep")).select(col("doc_id"), lit(true).as("g_ok"))
      val sigs = docs.select(col("doc_id"), md5(col("text")).as("sig"))
      val exactLosers = sigs
        .join(sigs.groupBy("sig").agg(min("doc_id").as("keep_id")), "sig")
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"), lit(true).as("ex"))
      val nearLosers = Dedup.sharedNearDupClusters(s, dir)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"), lit(true).as("nd"))
      val grams = TextAnalysis.sharedDocGrams(s, dir)
      val hold = grams.filter(col("b") >= 90).select("g").distinct()
      val contaminated = grams.join(hold, "g").select("doc_id").distinct()
        .withColumn("ct", lit(true))
      val flags = graft.CacheScope.eager(docs
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          (bucket < 90).as("tr"))
        .join(gate, Seq("doc_id"), "left")
        .join(exactLosers, Seq("doc_id"), "left")
        .join(nearLosers, Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("quality"), col("tr"),
          (col("tr") && coalesce(col("g_ok"), lit(false))).as("adm"),
          coalesce(col("ex"), lit(false)).as("ex"),
          coalesce(col("nd"), lit(false)).as("nd"),
          coalesce(col("ct"), lit(false)).as("ct"))
        .withColumn("s1", col("adm") && !col("ex"))
        .withColumn("sn", col("s1") && !col("nd"))
        .withColumn("sd", col("sn") && !col("ct")))
      val counts = flags.agg(
        count(lit(1)).as("n_total"),
        count(when(col("tr"), 1)).as("n_train"),
        count(when(col("adm"), 1)).as("n_admitted"),
        count(when(col("s1"), 1)).as("n_after_exact"),
        count(when(col("sn"), 1)).as("n_after_near"),
        count(when(col("sd"), 1)).as("n_after_decon"))
      val topk = udaf(new graft.functions.TopKAggregator(10))
      val fin = flags.filter(col("sd"))
        .groupBy("source")
        .agg(topk(col("quality"), col("doc_id")).as("top"))
        .select(explode(col("top")).as("t"))
        .agg(count(lit(1)).as("n_final"))
      counts.crossJoin(broadcast(fin))
        .select("n_total", "n_train", "n_admitted", "n_after_exact",
          "n_after_near", "n_after_decon", "n_final")
    },

    /** The corpus DATASHEET — the one-row summary a dataset release
      * ships (Gebru et al.'s datasheets; the stats tables of the
      * RedPajama/Dolma/FineWeb reports): document and token counts,
      * vocabulary size, exact- and near-duplication rates, mean quality
      * and the language-distribution entropy. Every number is a rollup
      * of machinery this engine already prices: counts and vocabulary
      * are map-side-combined aggregates, the near-dup rate reads the
      * SESSION-SHARED pair table (no new LSH pass), and the two
      * FP-bearing numbers follow the decimal-ledger discipline — mean
      * quality sums 6-rounded scores as DECIMAL(18,6), entropy sums
      * 9-rounded −p·ln p terms as DECIMAL(18,9) over the bounded
      * language table — so both engines aggregate identical values in
      * any order. Shape at 100 TB: three corpus passes (stats+sigs,
      * vocabulary, the memoized pair ladder) and bounded everything
      * else. */
    QueryDef("q120_corpus_datasheet", {
      val toks = "regexp_split_to_array(trim(text), '\\s+')"
      s"""WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($toks)) AS BIGINT) AS n_tokens,
         |    round(CAST(sum(CAST(${TextAnalysis.qualityScoreSql}
         |      AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality,
         |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
         |  FROM documents),
         |vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab
         |  FROM (SELECT unnest($toks) AS tok FROM documents)),
         |w AS (SELECT doc_id, $toks AS w FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(
         |    range(greatest(len(w)-2,0)), i -> w[i+1]||' '||w[i+2]||' '||w[i+3]))
         |    AS sh FROM w),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(a.sh) > 0 AND len(b.sh) > 0 AND
         |    len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_near_docs
         |  FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b FROM p)),
         |lang AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
         |ent AS (SELECT round(CAST(sum(CAST(round(
         |    -(c * 1.0 / base.n_docs) * ln(c * 1.0 / base.n_docs), 9)
         |    AS DECIMAL(18,9))) AS DOUBLE), 6) AS lang_entropy
         |  FROM lang, base)
         |SELECT base.n_docs, base.n_tokens, vocab.n_vocab,
         |  base.n_distinct_texts,
         |  round((base.n_docs - base.n_distinct_texts) * 1.0 / base.n_docs, 6)
         |    AS exact_dup_rate,
         |  round(nd.n_near_docs * 1.0 / base.n_docs, 6) AS neardup_doc_rate,
         |  base.mean_quality, ent.lang_entropy
         |FROM base, vocab, nd, ent""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+"))).cast("long")
          .as("n_tokens"),
        round(sum(TextAnalysis.qualityScore(col("text"))
            .cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
          .as("mean_quality"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"))
      val vocab = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .agg(countDistinct("tok").as("n_vocab"))
      val pairs = Dedup.sharedNearDupPairs(s, dir)
      val nd = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id")))
        .agg(countDistinct("doc_id").as("n_near_docs"))
      // n_docs for the entropy terms comes from the BOUNDED langs
      // aggregate (Σ c), not from re-evaluating `base` — reusing the
      // base frame here would re-run the full stats scan (including the
      // regex-heavy quality sum) just to fetch one count
      val langs = graft.CacheScope.persist(
        docs.groupBy("lang").agg(count(lit(1)).as("c")))
      val ent = langs.crossJoin(
          broadcast(langs.agg(sum("c").as("n_docs"))))
        .select(round(-(col("c") * 1.0 / col("n_docs")) *
            log(col("c") * 1.0 / col("n_docs")), 9)
          .cast("decimal(18,9)").as("term"))
        .agg(round(sum("term").cast("double"), 6).as("lang_entropy"))
      base.crossJoin(broadcast(vocab)).crossJoin(broadcast(nd))
        .crossJoin(broadcast(ent))
        .select(col("n_docs"), col("n_tokens"), col("n_vocab"),
          col("n_distinct_texts"),
          round((col("n_docs") - col("n_distinct_texts")) * 1.0 /
            col("n_docs"), 6).as("exact_dup_rate"),
          round(col("n_near_docs") * 1.0 / col("n_docs"), 6)
            .as("neardup_doc_rate"),
          col("mean_quality"), col("lang_entropy"))
    },

    /** Sequence PACKING manifest — the pretraining tokenizer's last
      * batch step: documents are concatenated in doc_id order and the
      * token stream is cut every 512 tokens into training sequences;
      * each document reports its global token offset and the first/last
      * sequence it lands in (a doc crossing a cut boundary spans several
      * — the standard packed-pretraining layout, where attention masks
      * or document separators handle the seams). The manifest is what a
      * sharded tokenizer job needs to write its slice of the packed
      * corpus independently: byte-exact placement of every doc without
      * any worker seeing its neighbors.
      *
      * The whole operator is one exact prefix sum over the corpus, and
      * the SHAPE is the point: the declarative form — `sum(n) OVER
      * (ORDER BY doc_id)`, which the oracle states — plans as a single
      * unpartitioned window, i.e. the entire corpus sorted through ONE
      * task (the q109 window lesson at its worst). The engine computes
      * the same integers with the classic two-sweep scan (Blelloch)
      * made hierarchical: docs fold into 4096-doc shards, shards into
      * 4096-shard supershards (≈16.7M docs each); the cumulative offset
      * is (bounded window over supershard totals) + (window over ≤4096
      * shard rows per supershard) + (window over ≤4096 doc rows per
      * shard). Every window partition is bounded by a constant however
      * large the corpus — at 1e10 docs the widest unpartitioned window
      * sees 600 supershard rows — and the only corpus-wide exchange is
      * the one hash shuffle by shard that the per-shard window needs
      * (the shard-total aggregate rides the same key, map-side
      * combined). All arithmetic is BIGINT (div, never /) so the gate
      * hash-matches bit-exactly. */
    QueryDef("q123_sequence_packing", {
      val toks = "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"
      s"""WITH n AS (SELECT doc_id, $toks AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS token_offset FROM n)
         |SELECT doc_id, n_tokens, token_offset,
         |  token_offset // 512 AS first_seq,
         |  CASE WHEN n_tokens > 0 THEN (token_offset + n_tokens - 1) // 512
         |       ELSE token_offset // 512 END AS last_seq,
         |  CASE WHEN n_tokens > 0 THEN (token_offset + n_tokens - 1) // 512
         |       ELSE token_offset // 512 END - token_offset // 512 + 1
         |    AS n_seqs
         |FROM c""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = graft.CacheScope.persist(t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          expr("doc_id div 4096").as("shard")))
      val shardTot = graft.CacheScope.persist(
        docs.groupBy("shard").agg(sum("n_tokens").as("tot"))
          .withColumn("sshard", expr("shard div 4096")))
      // level 2: offsets of each supershard — the recursion base, a
      // bounded single-partition window (corpus_docs / 4096² rows)
      val w2 = Window.orderBy("sshard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sshardOff = shardTot.groupBy("sshard").agg(sum("tot").as("stot"))
        .select(col("sshard"),
          coalesce(sum("stot").over(w2), lit(0L)).as("soff"))
      // level 1: shard offsets — ≤4096 shard rows per supershard
      // partition; the supershard offset table is tiny → broadcast
      val w1 = Window.partitionBy("sshard").orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val shardOff = shardTot
        .withColumn("within", coalesce(sum("tot").over(w1), lit(0L)))
        .join(broadcast(sshardOff), "sshard")
        .select(col("shard"), (col("within") + col("soff")).as("shard_off"))
      // level 0: ≤4096 doc rows per shard partition. The join keys the
      // same `shard` column the window just hash-partitioned by, and the
      // offset side is shard-sized — Catalyst/AQE broadcasts it here; at
      // extreme scale it degrades to a co-partitioned shuffle join, not
      // a corpus sort
      val w0 = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val firstSeq = expr("token_offset div 512")
      val lastSeq = when(col("n_tokens") > 0,
        expr("(token_offset + n_tokens - 1) div 512")).otherwise(firstSeq)
      docs
        .withColumn("within", coalesce(sum("n_tokens").over(w0), lit(0L)))
        .join(shardOff, "shard")
        .select(col("doc_id"), col("n_tokens"),
          (col("within") + col("shard_off")).as("token_offset"))
        .select(col("doc_id"), col("n_tokens"), col("token_offset"),
          firstSeq.as("first_seq"), lastSeq.as("last_seq"),
          (lastSeq - firstSeq + 1).as("n_seqs"))
    },

    /** C4 heuristic line filters (Raffel et al. 2020, §2.2 — the
      * cleaning recipe behind C4/T5, reused by Pile-CC/RefinedWeb):
      * keep only lines that end in terminal punctuation, hold ≥ 5
      * words, and don't mention javascript; drop whole pages containing
      * "lorem ipsum" or a curly brace, or retaining < 3 lines. The
      * corpus is punctuation- and newline-free, so — the q93 PII
      * posture — the query plants its own deterministic line structure
      * first: words regroup into 10-word lines, and doc_id arithmetic
      * plants terminal periods (2 of 3 lines), javascript mentions,
      * lorem-ipsum markers and braces, so every rule fires both ways on
      * real text built from corpus content. The RULES then read only
      * the augmented text, never the plant schedule.
      *
      * Shape at 100 TB: pure per-row work — line split, per-line
      * predicates, filtered rejoin are one narrow codegen'd map with no
      * shuffle at all (the ideal curation-filter shape: C4 cleaning is
      * embarrassingly parallel and runs at scan speed). */
    QueryDef("q128_c4_filters",
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |l AS (SELECT doc_id, list_transform(range((len(w)+9)//10), l ->
        |    array_to_string(w[CAST(l*10+1 AS INT):CAST(l*10+10 AS INT)], ' ')
        |    || CASE WHEN (doc_id + l) % 11 = 0 THEN ' javascript' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 AND l = 0 THEN ' lorem ipsum' ELSE '' END
        |    || CASE WHEN doc_id % 17 = 0 AND l = 1 THEN ' {' ELSE '' END
        |    || CASE WHEN (doc_id + l) % 3 <> 0 THEN '.' ELSE '' END) AS lines
        |  FROM w),
        |k AS (SELECT doc_id, lines, list_filter(lines, ln ->
        |    ends_with(ln, '.') AND len(regexp_split_to_array(ln, '\s+')) >= 5
        |    AND NOT contains(ln, 'javascript')) AS kept FROM l)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  len(kept) >= 3
        |    AND len(list_filter(lines, ln -> contains(ln, 'lorem ipsum'))) = 0
        |    AND len(list_filter(lines, ln -> contains(ln, '{'))) = 0 AS page_keep,
        |  coalesce(array_to_string(kept, chr(10)), '') AS cleaned
        |FROM k""".stripMargin.replace("\n", " ")) { (s, dir) =>
      c4Report(t(s, dir, "documents"), col("doc_id"), col("doc_id"))
    },

    /** Temperature-scaled source sampling (the mT5/CC-100 α-mixing rule,
      * Xue 2021 §3.1 / Conneau 2020 §3): sampling weight p_i ∝ n_i^α
      * with α = 0.5, flattening the natural source distribution so
      * low-resource sources are up-sampled — the third member of the
      * mixture family next to DSIR (q102, per-DOC importance) and DoReMi
      * (q111, LEARNED per-source weights): this one is the closed-form
      * rule a pipeline applies when no proxy model exists. Emits, per
      * source, the natural token count, the α-weight, and the implied
      * epoch multiplier at a 1e9-token budget (epochs > 1 = the source
      * is repeated, the Muennighoff 2023 repetition regime).
      *
      * α = 0.5 deliberately: n^0.5 = sqrt(n), IEEE-754 correctly-rounded
      * in every engine — whereas pow(x, 0.3) is libm-specific and can
      * differ in the last ulp (the q114 lesson: only correctly-rounded
      * ops are cross-engine contracts). The weight denominator is a
      * LEFT FOLD over the per-source sqrt terms in sorted-source order
      * (list_reduce / aggregate — both engines fold sequentially over
      * the same order), so even the double SUM is bit-identical.
      *
      * Shape at 100 TB: one map-side-combined corpus aggregate to the
      * per-source token table (bounded: |sources| rows), then driver-free
      * closed-form arithmetic on that bounded table — the weight table
      * broadcasts back to whatever sampler consumes it. */
    QueryDef("q132_temperature_mix",
      """WITH tk AS (SELECT source,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sw FROM tk),
        |d AS (SELECT list_reduce(list(sw ORDER BY source), (a, b) -> a + b) AS denom FROM w)
        |SELECT w.source, w.n_tokens,
        |  round(w.sw / d.denom, 6) AS weight,
        |  round(1000000000.0 * (w.sw / d.denom) / CAST(w.n_tokens AS DOUBLE), 6) AS epochs
        |FROM w, d""".stripMargin.replace("\n", " ")) { (s, dir) =>
      alphaMix(t(s, dir, "documents").groupBy("source")
        .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tokens")))
    },

    /** Policy blocklist gate: whole-WORD blocklist filtering with
      * per-document evidence — the LDNOOBW-style term gate every corpus
      * policy layer runs before its model-based filters. C4 dropped any
      * page containing a blocklist term; Dolma and RefinedWeb gate on
      * DENSITY instead so medical/educational text survives — the
      * density rule here (keep iff blocked tokens < 10% of tokens).
      * Matching is tokenized, not substring: "hash" flags neither
      * "hashing" nor "rehash", which LIKE/regex substring scans get
      * wrong. The keep decision is exact integer arithmetic
      * (10·n_blocked < n_tokens) — no float threshold to drift
      * cross-engine. The three-term list stands in for the policy
      * dictionary; the operator is list-agnostic.
      *
      * Shape at 100 TB: ZERO shuffle — per-doc token stats are
      * row-local array arithmetic ([[blocklistReport]], shared verbatim
      * with the streaming gate view), the blocklist a literal IN-set
      * inside the scan projection (production: a broadcast dictionary).
      * The oracle tokenizes by explode+agg because SQL lambdas can't
      * close over the list — same arithmetic, different engine idiom. */
    QueryDef("q139_blocklist_gate",
      """WITH a AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, toks,
        |    list_filter(toks, t -> list_contains(['slow', 'hash', 'vector'], t)) AS blocked
        |  FROM a)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(blocked) AS BIGINT) AS n_blocked,
        |  coalesce(array_to_string(list_sort(list_distinct(blocked)), ','), '') AS matched_terms,
        |  10 * len(blocked) < len(toks) OR len(toks) = 0 AS keep
        |FROM b""".stripMargin.replace("\n", " ")) { (s, dir) =>
      blocklistReport(t(s, dir, "documents"), col("doc_id"))
    },

    /** Bloom-GATED decontamination — q26's semantics behind q82's plan
      * posture, composed: build one bloom over the holdout's distinct
      * 5-grams (the bounded benchmark side — on a real corpus this is
      * the published eval suite, a few MB of sketch broadcast to every
      * executor), then cull the TRAIN side's grams map-side BEFORE the
      * exact gram join. At 100 TB this is the difference between
      * shuffling the corpus's entire distinct-gram table (q26) and
      * shuffling only grams that might be contaminated — the bloom
      * eliminates ~99% of shuffle bytes at fpp=0.01 since real
      * contamination is rare. The exact join still runs ABOVE the
      * bloom, so a false positive can never reach the result (q82's
      * invariant, spec-pinned by equality with q26); the oracle is
      * q26's verbatim — a plan optimization must be invisible in the
      * answer. Sizing: `expectedNumItems` from an exact count over the
      * already-materialized session gram memo (cheap; a guessed
      * constant either overallocates every executor's memory or
      * degrades fpp exactly when the benchmark grows). */
    QueryDef("q146_bloom_decontaminate", decontaminateOracle) { (s, dir) =>
      val grams = TextAnalysis.sharedDocGrams(s, dir)
      // r14: holdout was computed three times — the bloom-sizing count,
      // the bloom build scan, and the join side each re-ran the
      // filter+distinct over the gram table. Persist once; the count
      // doubles as the eager materialization.
      val holdout = graft.CacheScope.persist(
        grams.filter(col("b") >= 90).select("g").distinct())
      val bloom = holdout.stat.bloomFilter(
        "g", math.max(holdout.count(), 1L), 0.01)
      val bc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((g: String) => bc.value.mightContainString(g))
      grams.filter(col("b") < 90)
        .filter(mightContain(col("g"))) // pre-shuffle gram cull
        .join(holdout, "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    },

    /** Leakage-safe train/val/test split: q34's content-hash bucketing
      * with the GROUP constraint evals require — near-duplicates of a
      * training document must not land in test (a test doc with a
      * training near-copy is a leaked eval, the reason eval-dedup
      * exists). Every member of a q36 near-dup cluster inherits the
      * bucket of the cluster REPRESENTATIVE's content (min-id member),
      * so no cluster can straddle splits BY CONSTRUCTION; singletons
      * hash their own content, collapsing to exactly q34.
      *
      * Scale: the cluster table is duplicate-density-sized; the
      * representative lookup joins (id, 8-hex-digit bucket) pairs
      * computed AT THE SCAN — the q163 rule: ship digests, never
      * documents, through a corpus-sized join. */
    QueryDef("q165_leak_safe_split", {
      val b = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100"
      s"""WITH RECURSIVE $clusterCtes,
         |b0 AS (SELECT doc_id, $b AS bucket FROM documents),
         |k AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep_id,
         |    c.cluster_id IS NOT NULL AS grouped
         |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
         |SELECT k.doc_id, k.rep_id AS split_key,
         |  CAST(r.bucket AS BIGINT) AS bucket,
         |  CASE WHEN r.bucket < 90 THEN 'train'
         |       WHEN r.bucket < 95 THEN 'val' ELSE 'test' END AS split,
         |  k.grouped
         |FROM k JOIN b0 r ON r.doc_id = k.rep_id
         |""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      val b0 = t(s, dir, "documents")
        .select(col("doc_id").as("rep_id"), bucket.as("bucket"))
      t(s, dir, "documents").select("doc_id")
        .join(Dedup.sharedNearDupClusters(s, dir), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("rep_id"),
          col("cluster_id").isNotNull.as("grouped"))
        .join(b0, "rep_id")
        .select(col("doc_id"), col("rep_id").as("split_key"), col("bucket"),
          when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
            .otherwise("test").as("split"),
          col("grouped"))
    },

    /** Split-leakage audit — the measurement q165 is the fix for: under
      * the NAIVE per-document split (q34's rule), how many val/test
      * documents have a near-duplicate in train? Each such document is
      * a leaked eval (the model saw a near-copy in training), so this
      * report is the acceptance check a split ships with. Output: one
      * row per leaked eval doc with its split and train-neighbor count.
      *
      * Scale: the pair frame is the session-memoized duplicate-density
      * pair table; split labels are (id, bucket) pairs computed at the
      * scan and joined onto pair endpoints — digests through the join,
      * never documents. */
    QueryDef("q166_split_leakage", {
      val b = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100"
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |s AS (SELECT doc_id, list_distinct(list_transform(range(greatest(len(w)-2,0)),
         |        i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS sh FROM w),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE len(a.sh) > 0 AND len(b.sh) > 0 AND len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         |sp AS (SELECT doc_id,
         |    CASE WHEN $b < 90 THEN 'train' WHEN $b < 95 THEN 'val'
         |         ELSE 'test' END AS split FROM documents),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs)
         |SELECT e.a AS doc_id, sa.split, CAST(count(*) AS BIGINT) AS n_train_neighbors
         |FROM e JOIN sp sa ON sa.doc_id = e.a JOIN sp sb ON sb.doc_id = e.b
         |WHERE sa.split <> 'train' AND sb.split = 'train'
         |GROUP BY 1, 2""".stripMargin.replace("\n", " ")
    }) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
        lit(100L))
      val sp = t(s, dir, "documents").select(col("doc_id"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      val p = Dedup.sharedNearDupPairs(s, dir).select("doc_a", "doc_b")
      val e = p.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionByName(p.select(col("doc_b").as("a"), col("doc_a").as("b")))
      e.join(sp.select(col("doc_id").as("a"), col("split")), "a")
        .join(sp.select(col("doc_id").as("b"),
          col("split").as("split_b")), "b")
        .filter(col("split") =!= "train" && col("split_b") === "train")
        .groupBy(col("a").as("doc_id"), col("split"))
        .agg(count(lit(1)).as("n_train_neighbors"))
    },

    /** Content-defined chunking — Rabin-style variable-size chunks whose
      * boundaries come from the CONTENT (a char 8-gram hash hitting
      * 0 mod 64 cuts after that window), not from fixed offsets: insert
      * one character and only the chunk containing the edit changes,
      * where q157's fixed windows shift EVERY downstream boundary. The
      * storage-dedup chunking recipe (LBFS/rsync lineage) applied to
      * corpus text, with the cross-doc duplicate-chunk count (n_docs per
      * content digest) as the payoff column — shared content found at
      * SHIFTED offsets, the case fixed-stride chunking structurally
      * misses. The window hash is q105's md5-prefix recipe, so the
      * oracle replays boundaries bit-identically.
      *
      * Scale: the boundary scan is the codegen'd window explode with a
      * row-level modulus filter — the shuffle carries ONE row per
      * boundary (~1/64 of characters), grouped back per doc; chunk
      * digests shuffle as 16-byte keys for the duplicate count. No
      * all-pairs anything; cost is corpus-linear with a 64× reduced
      * shuffle. */
    QueryDef("q169_cdc_chunking",
      """WITH h AS (SELECT doc_id, text,
        |    list_filter(list_transform(range(greatest(length(text) - 7, 0)),
        |      i -> CAST(i + 8 AS BIGINT)),
        |      c -> CAST(('0x' || substr(md5(substr(text, CAST(c - 7 AS INT), 8)), 1, 8)) AS BIGINT) % 64 = 0
        |           AND c < length(text)) AS cuts
        |  FROM documents),
        |ch AS (SELECT doc_id, text, CAST(u.j AS BIGINT) AS chunk_idx,
        |    CASE WHEN u.j = 0 THEN CAST(0 AS BIGINT)
        |         ELSE cuts[CAST(u.j AS INT)] END AS cstart,
        |    CASE WHEN u.j = len(cuts) THEN CAST(length(text) AS BIGINT)
        |         ELSE cuts[CAST(u.j + 1 AS INT)] END AS cend
        |  FROM h, unnest(range(len(cuts) + 1)) AS u(j)),
        |m AS (SELECT doc_id, chunk_idx, cstart,
        |    cend - cstart AS clen,
        |    md5(substr(text, CAST(cstart + 1 AS INT), CAST(cend - cstart AS INT))) AS chunk_md5
        |  FROM ch),
        |df AS (SELECT chunk_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM m GROUP BY 1)
        |SELECT m.doc_id, m.chunk_idx, m.cstart, m.clen, m.chunk_md5, df.n_docs
        |FROM m JOIN df USING (chunk_md5)""".stripMargin.replace("\n", " ")) { (s, dir) =>
      // r13 opt: the boundary scan pays one md5 PER CHARACTER — by far
      // this query's heaviest stage — and the bench corpus arrives as a
      // single scan split, so it ran on ONE task (1.4s at sf0.1).
      // r14 (guide §2.4, the q37 move): the spread is a doc_id hash
      // repartition, so the cached frame is already clustered for the
      // cut aggregation AND the doc⋈cuts join — the boundary rows and
      // the doc table never hit a further exchange.
      val docs = graft.CacheScope.persist(
        t(s, dir, "documents").select(col("doc_id"), col("text"),
          length(col("text")).cast("long").as("n"))
          .repartition(col("doc_id")))
      // boundary scan: native window explode, codegen'd hash + modulus
      // filter AT THE ROW — only boundaries reach the shuffle
      val cuts = docs
        .select(col("doc_id"), col("n"),
          posexplode(graft.functions.NGrams.charWindowGrams(col("text"), 8))
            .as(Seq("i", "g")))
        .filter(conv(substring(md5(col("g")), 1, 8), 16, 10)
          .cast("long") % 64 === 0 && (col("i") + 8) < col("n"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list((col("i") + 8).cast("long"))).as("cuts"))
      val withCuts = docs.join(cuts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"), col("n"),
          coalesce(col("cuts"), array().cast("array<long>")).as("cuts"))
      // r14 opt (r13 VERDICT #4): the r13 form counted duplicates with
      // `size(collect_set(doc_id)) OVER (PARTITION BY chunk_md5)` — one
      // hot chunk digest (boilerplate shared by millions of docs at
      // corpus scale) lands ALL its rows in one window partition and
      // holds every distinct doc_id in a single in-memory buffer. The
      // two-phase `groupBy(chunk_md5).agg(countDistinct)` + join is
      // restored (partial aggregation bounds per-key state), and the
      // recompute the window had fixed is fixed at its root instead: the
      // manifest is EAGER-persisted, so the join's broadcast/build side
      // reads cached blocks rather than racing the lazy persist and
      // re-running the md5-per-character boundary scan.
      val manifest = graft.CacheScope.eager(withCuts
        .select(col("doc_id"), col("text"), col("n"), col("cuts"),
          posexplode(concat(array(lit(0L)), col("cuts")))
            .as(Seq("chunk_idx", "cstart")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("cstart"),
          (when(col("chunk_idx") < size(col("cuts")),
            element_at(col("cuts"), col("chunk_idx") + 1))
            .otherwise(col("n")) - col("cstart")).as("clen"),
          col("text"))
        .select(col("doc_id"), col("chunk_idx"), col("cstart"), col("clen"),
          md5(col("text").substr((col("cstart") + 1).cast("int"),
            col("clen").cast("int"))).as("chunk_md5")))
      val dupCounts = manifest.groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      manifest.join(dupCounts, Seq("chunk_md5"))
        .select("doc_id", "chunk_idx", "cstart", "clen", "chunk_md5",
          "n_docs")
    }
  )

  /** q132's α=0.5 mixture arithmetic over a per-source token-count
    * table, shared with the streaming mixture view (one code path):
    * (source, n_tokens) → (source, n_tokens, weight, epochs). The
    * denominator is a sequential left fold over sorted-source order —
    * sort_array on (source, sw) structs orders by the unique source, and
    * aggregate folds left like DuckDB's list_reduce (0.0 + first term is
    * exact), so the double sum is bit-identical cross-engine. */
  private[graft] def alphaMix(tk0: DataFrame): DataFrame = {
    val tk = tk0.withColumn("sw", sqrt(col("n_tokens").cast("double")))
    val denom = tk
      .agg(aggregate(
        transform(
          sort_array(collect_list(struct(col("source"), col("sw")))),
          _.getField("sw")),
        lit(0.0d), (acc, x) => acc + x).as("denom"))
    tk.crossJoin(broadcast(denom))
      .select(col("source"), col("n_tokens"),
        round(col("sw") / col("denom"), 6).as("weight"),
        round(lit(1000000000.0) * (col("sw") / col("denom"))
          / col("n_tokens").cast("double"), 6).as("epochs"))
  }

  /** The write side of the pipeline: materialize the curated corpus as
    * a hive-partitioned parquet layout `split=…/lang=…/` — the output
    * contract a downstream tokenizer/trainer consumes with partition
    * pruning (`WHERE split='train' AND lang='en'` reads only that
    * directory, zero data skipped-then-filtered).
    *
    * Layout discipline at 100 TB:
    *  - `repartition(partition cols)` BEFORE the write: without it every
    *    task holding rows of a (split, lang) opens its own file there —
    *    tasks × partitions small files, the classic output explosion.
    *    With it, each hive partition is written by the task(s) that own
    *    it. (If one partition dwarfs the rest, add a salt column to the
    *    repartition — more writer tasks for that partition only.)
    *  - `maxRecordsPerFile` bounds file size so a giant partition still
    *    splits into scan-parallel files.
    *  - `sortWithinPartitions(doc_id)` gives each file a sorted doc_id
    *    run → parquet min/max row-group stats make point lookups and
    *    range scans by doc_id skip whole files.
    */
  /** Write-audit metrics emitted by [[exportCorpus]]'s single pass.
    * minQuality is None when the curated corpus is empty — `min` observes
    * null there, and unboxing it would fabricate a 0.0 floor. */
  final case class ExportAudit(nRows: Long, nEmptyText: Long,
      minQuality: Option[Double])

  def exportCorpus(s: SparkSession, dir: String, outPath: String,
      maxRecordsPerFile: Long = 1000000): ExportAudit = {
    val curated = queries.find(_.name == "q39_curated_corpus").get.build(s, dir)
    val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
    // Observation rides the write job itself — the audit row count /
    // empty-text count / quality floor come from the SAME pass that
    // wrote the files (free at 100 TB), not a second scan that could
    // also silently disagree with what was written
    val audit = new org.apache.spark.sql.Observation("export_audit")
    curated.join(docs, "doc_id")
      .observe(audit,
        count(lit(1)).as("n_rows"),
        count(when(length(trim(col("text"))) === 0, 1)).as("n_empty"),
        min("quality").as("min_q"))
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split", "lang")
      .parquet(outPath)
    val m = audit.get
    ExportAudit(m("n_rows").asInstanceOf[Long],
      m("n_empty").asInstanceOf[Long],
      Option(m("min_q")).map(_.asInstanceOf[Double]))
  }
}
