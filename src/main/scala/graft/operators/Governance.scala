package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Training-data governance & monitoring tier — the two audits a
  * production corpus pipeline runs continuously beside the quality
  * gates: DISTRIBUTION DRIFT between ingest windows (a crawl whose
  * type/source mix shifts silently poisons the mixture weights
  * downstream of q90/q111) and PRIVACY RISK over structured dimension
  * tables (k-anonymity of quasi-identifier equivalence classes, the
  * governance counterpart of the q93/q149 document-side gates).
  *
  * Scale posture: both operators reduce the corpus to a BOUNDED frame
  * in one partial-aggregated pass (windows × categories; QI-space
  * classes) and do all their arithmetic there — at 100 TB the only
  * corpus-sized cost is the first groupBy's map-side-combined shuffle
  * of short keys.
  */
object Governance {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Population-stability-index report over a (window DATE `d`,
    * category `event_type`, count `c`) frame: for every consecutive-day
    * pair, PSI = Σ_cat (p−q)·ln(p/q) over the categories present in
    * BOTH windows (the standard convention; one-sided categories are
    * surfaced via n_types so a vanishing category is visible, not
    * silently smoothed). Shared verbatim by batch q161 and the
    * [[graft.streaming.StreamingDrift]] read path, so the two cannot
    * drift — the q138 DECIMAL-ledger recipe makes the category sum
    * order-independent (each term rounded to 12, summed exactly;
    * a parallel double sum re-associates with the shuffle). */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.groupBy("d").agg(sum("c").as("n"))
    val shares = counts.join(tot, "d")
      .select(col("d"), col("event_type"),
        (col("c") / col("n")).as("p"))
    val prev = shares.select(col("d").as("db"),
      col("event_type").as("et_b"), col("p").as("q"))
    shares.join(prev,
        col("db") === date_add(col("d"), 1) &&
          col("event_type") === col("et_b"))
      .select(col("d"), col("db"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 12)
          .cast("decimal(28,12)").as("term"))
      .groupBy("d", "db")
      .agg(count(lit(1)).as("n_types"), sum("term").as("sl"))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("day_a"),
        date_format(col("db"), "yyyy-MM-dd").as("day_b"),
        col("n_types"),
        round(col("sl").cast("double"), 6).as("psi"),
        (round(col("sl").cast("double"), 6) >= DriftThreshold).as("drifted"))
  }

  /** The two raters q168 compares, as row-level verdict Columns over a
    * documents-shaped row — shared with [[graft.streaming
    * .StreamingAgreement]] so the gates cannot drift. */
  def raterA: org.apache.spark.sql.Column =
    (col("n_chars") >= 200).cast("int")
  def raterB: org.apache.spark.sql.Column =
    (size(split(trim(col("text")), "\\s+")) >= 40).cast("int")

  /** Cohen's kappa over a (source, a, b, c) confusion-cell frame — the
    * bounded read-side arithmetic shared verbatim by batch q168 and the
    * streaming agreement view (the psiFromCounts posture): pivot the
    * ≤4 cells per source, then κ = (p_o − p_e)/(1 − p_e) on
    * marginal-share doubles (never integer products — corpus-scale n²
    * overflows a long). κ is NULL when p_e = 1 (a constant-rater
    * source has no chance-corrected signal). */
  def kappaFromCells(cells: DataFrame): DataFrame = {
    def cell(a: Int, b: Int) = coalesce(sum(
      when(col("a") === a && col("b") === b, col("c"))), lit(0L))
    val g = cells.groupBy("source")
      .agg(sum("c").as("n"), cell(1, 1).as("n11"), cell(1, 0).as("n10"),
        cell(0, 1).as("n01"), cell(0, 0).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe =
      ((col("n11") + col("n10")).cast("double") / nD) *
        ((col("n11") + col("n01")).cast("double") / nD) +
      ((col("n01") + col("n00")).cast("double") / nD) *
        ((col("n10") + col("n00")).cast("double") / nD)
    g.select(col("source"), col("n"), col("n11"), col("n10"),
      col("n01"), col("n00"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Flag threshold for [[psiFromCounts]]. The textbook "investigate"
    * band starts at 0.1; at gate scale the daily samples are small
    * (~64 events per day-type at sf0.01) so pure sampling noise spans
    * ~0.001–0.05 and the planted one-category drops peak at 0.05–0.09
    * — 0.02 lands inside the overlap so BOTH verdicts are exercised
    * (21/8 at sf0.01). At production scale daily samples are large,
    * the noise floor collapses toward 0, and the same threshold reads
    * as a genuinely tight drift alarm. */
  val DriftThreshold = 0.02

  val queries: Seq[QueryDef] = Seq(

    /** Day-over-day drift of the event-type mix. The corpus is
      * uniform by construction, so drift is PLANTED on a schedule the
      * oracle replays verbatim (the q93/q148 posture): days whose
      * day-of-month is a multiple of 7 lose their 'click' events
      * before the tally, so pairs touching those days read strongly
      * drifted (category missing → n_types drops AND the remaining
      * shares shift); the quietest pairs sit under the threshold and
      * pin the stable verdict (see [[DriftThreshold]]). */
    QueryDef("q161_drift_psi",
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_type FROM events
        |  WHERE NOT (event_type = 'click' AND day(CAST(ts AS DATE)) % 7 = 0)),
        |c AS (SELECT d, event_type, count(*) AS c FROM ev GROUP BY 1, 2),
        |t AS (SELECT d, sum(c) AS n FROM c GROUP BY 1),
        |s AS (SELECT c.d, c.event_type, c.c * 1.0 / t.n AS p
        |      FROM c JOIN t USING (d)),
        |pr AS (SELECT a.d, b.d AS db,
        |    CAST(round((a.p - b.p) * ln(a.p / b.p), 12) AS DECIMAL(28,12)) AS term
        |  FROM s a JOIN s b ON b.d = a.d + 1 AND a.event_type = b.event_type)
        |SELECT strftime(d, '%Y-%m-%d') AS day_a, strftime(db, '%Y-%m-%d') AS day_b,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS psi,
        |  round(CAST(sum(term) AS DOUBLE), 6) >= 0.02 AS drifted
        |FROM pr GROUP BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val counts = t(s, dir, "events")
        .select(to_date(col("ts")).as("d"), col("event_type"))
        .filter(!(col("event_type") === "click" &&
          dayofmonth(col("d")) % 7 === 0))
        .groupBy("d", "event_type")
        .agg(count(lit(1)).as("c"))
      psiFromCounts(counts)
    },

    /** k-anonymity audit of the customer dimension: equivalence
      * classes over the quasi-identifier (nation, market segment) with
      * class size and an at-risk flag (size < k ⇒ a joined external
      * dataset could single out those rows). k is policy — 8 here,
      * chosen at the dimension's class-size scale so the gate
      * exercises both verdicts (11 of 125 classes trip at sf0.01).
      * Output is one row per CLASS — bounded by the QI space, never
      * the table; the groupBy partial-aggregates map-side. */
    QueryDef("q162_k_anonymity",
      "SELECT c_nationkey, c_mktsegment, " +
        "CAST(count(*) AS BIGINT) AS class_size, " +
        "count(*) < 8 AS at_risk " +
        "FROM customer GROUP BY 1, 2") { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("class_size"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("class_size"), (col("class_size") < 8).as("at_risk"))
    },

    /** Snapshot diff — the corpus-delta audit run between two crawl /
      * pipeline versions before retraining ("what changed since v1?").
      * v2 is SYNTHESIZED from v1 on deterministic id schedules the
      * oracle replays verbatim (the q93/q148/q161 posture): every 13th
      * doc is revised, every 17th dropped, every 19th contributes a
      * brand-new doc. Added ids are NEGATIVE (-doc_id - 1): real
      * doc_ids are non-negative at every scale factor, so synthetic
      * ids can never collide with genuine v1 ids — an additive offset
      * would silently misclassify once real ids reach it, and both
      * engines would agree so the gate couldn't catch it (r12
      * ADVICE). The diff itself is the production
      * operator: both sides reduce to (doc_id, source, 128-bit content
      * digest) AT THE SCAN, so the full-outer join ships 16-byte
      * digests, never documents — at 100 TB the shuffle is the id+hash
      * table, and the output is bounded by classes × sources. */
    QueryDef("q163_snapshot_diff",
      """WITH v1 AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |v2 AS (SELECT doc_id, source,
        |    md5(text || CASE WHEN doc_id % 13 = 0 THEN ' [rev2]' ELSE '' END) AS h
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT -doc_id - 1, source, md5(text)
        |  FROM documents WHERE doc_id % 19 = 0),
        |j AS (SELECT coalesce(a.source, b.source) AS source,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN a.h <> b.h THEN 'changed'
        |         ELSE 'unchanged' END AS change_class
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT change_class, source, CAST(count(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY 1, 2""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val v1 = docs.select(col("doc_id"), col("source"),
        md5(col("text")).as("h"))
      val v2 = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("source"),
          md5(concat(col("text"),
            when(col("doc_id") % 13 === 0, " [rev2]").otherwise("")))
            .as("h"))
        .unionByName(docs.filter(col("doc_id") % 19 === 0)
          .select((-col("doc_id") - 1L).as("doc_id"), col("source"),
            md5(col("text")).as("h")))
      v1.select(col("doc_id"), col("source").as("s_a"), col("h").as("h_a"))
        .join(v2.select(col("doc_id"), col("source").as("s_b"),
          col("h").as("h_b")), Seq("doc_id"), "full_outer")
        .select(coalesce(col("s_a"), col("s_b")).as("source"),
          when(col("h_a").isNull, "added")
            .when(col("h_b").isNull, "removed")
            .when(col("h_a") =!= col("h_b"), "changed")
            .otherwise("unchanged").as("change_class"))
        .groupBy("change_class", "source")
        .agg(count(lit(1)).as("n_docs"))
    },

    /** Acceptance-sampling audit of a quality gate: per source, the
      * gate pass rate with its Wilson 95% score interval, and an SLO
      * verdict on the LOWER bound (the statistically honest check — a
      * point estimate over a small window passes SLOs it cannot
      * support). All arithmetic is the same IEEE expression tree in
      * both engines (÷, ×, √ are correctly rounded; no libm
      * transcendentals), so the gate hash-matches the bounds exactly.
      * One partial+final agg to a sources-sized frame; the interval
      * math runs on that bounded frame. */
    QueryDef("q164_gate_ci", {
      // CAST(… AS DOUBLE) so DuckDB evaluates the same binary-double
      // expression tree as Spark's lit(1.96): bare 1.96 parses as
      // DECIMAL there, making z*z exact (3.8416) instead of the
      // double product — an ulp divergence round(…,6) masks except at
      // knife-edge meets_slo boundaries (r12 ADVICE).
      val z = "CAST(1.96 AS DOUBLE)"
      val lo = s"((ph + $z*$z/(2*nd)) - $z * sqrt(ph*(1-ph)/nd + $z*$z/(4*nd*nd))) / (1 + $z*$z/nd)"
      val hi = s"((ph + $z*$z/(2*nd)) + $z * sqrt(ph*(1-ph)/nd + $z*$z/(4*nd*nd))) / (1 + $z*$z/nd)"
      "WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(count(*) FILTER (n_chars >= 200) AS BIGINT) AS n_pass " +
        "FROM documents GROUP BY 1), " +
        "b AS (SELECT source, n, n_pass, " +
        "n_pass * CAST(1.0 AS DOUBLE) / n AS ph, " +
        "n * CAST(1.0 AS DOUBLE) AS nd FROM a) " +
        s"SELECT source, n, n_pass, round(ph, 6) AS pass_rate, " +
        s"round($lo, 6) AS ci_lo, round($hi, 6) AS ci_hi, " +
        s"round($lo, 6) >= 0.6 AS meets_slo FROM b"
    }) { (s, dir) =>
      val z = lit(1.96)
      val agg = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          count(when(col("n_chars") >= 200, lit(1))).as("n_pass"))
        .select(col("source"), col("n"), col("n_pass"),
          (col("n_pass") * lit(1.0) / col("n")).as("ph"),
          (col("n") * lit(1.0)).as("nd"))
      val ph = col("ph"); val nd = col("nd")
      val center = ph + z * z / (lit(2) * nd)
      val half = z * sqrt(ph * (lit(1) - ph) / nd +
        z * z / (lit(4) * nd * nd))
      val denom = lit(1) + z * z / nd
      agg.select(col("source"), col("n"), col("n_pass"),
        round(ph, 6).as("pass_rate"),
        round((center - half) / denom, 6).as("ci_lo"),
        round((center + half) / denom, 6).as("ci_hi"),
        (round((center - half) / denom, 6) >= 0.6).as("meets_slo"))
    },

    /** Inter-gate agreement (Cohen's kappa) — the label-quality audit a
      * pipeline runs before trusting ANY single quality gate: two
      * independent raters over the same corpus (here the q164 length
      * gate, n_chars ≥ 200, and a lexical gate, ≥ 40 tokens), reduced
      * per source to the 2×2 confusion counts, with chance-corrected
      * agreement κ = (p_o − p_e)/(1 − p_e). High raw agreement with low
      * κ is the classic trap this audit catches (both gates passing 95%
      * of docs agree 90%+ by CHANCE alone).
      *
      * Scale: one partial+final agg to a sources-sized frame (four
      * conditional counts, map-side combined); all probability
      * arithmetic runs on that bounded frame as marginal-share doubles
      * (never integer products, which would overflow at corpus-scale
      * n²), every term the same IEEE ÷/×/− tree in both engines. κ is
      * NULL when p_e = 1 (a degenerate constant-rater source has no
      * chance-corrected signal — surfaced, not fabricated). */
    QueryDef("q168_gate_kappa",
      """WITH r AS (SELECT source,
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 40
        |         THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (a = 1 AND b = 1) AS BIGINT) AS n11,
        |    CAST(count(*) FILTER (a = 1 AND b = 0) AS BIGINT) AS n10,
        |    CAST(count(*) FILTER (a = 0 AND b = 1) AS BIGINT) AS n01,
        |    CAST(count(*) FILTER (a = 0 AND b = 0) AS BIGINT) AS n00
        |  FROM r GROUP BY 1),
        |p AS (SELECT source, n, n11, n10, n01, n00,
        |    CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |    (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
        |    (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) AS pe
        |  FROM c)
        |SELECT source, n, n11, n10, n01, n00,
        |  round(po, 6) AS po, round(pe, 6) AS pe,
        |  CASE WHEN pe = 1.0 THEN NULL
        |       ELSE round((po - pe) / (1.0 - pe), 6) END AS kappa
        |FROM p""".stripMargin.replace("\n", " ")) { (s, dir) =>
      // confusion CELLS first (≤4 per source, map-side combined), then
      // the shared read-side kappa arithmetic — one code path with the
      // streaming agreement view
      val cells = t(s, dir, "documents")
        .select(col("source"), raterA.as("a"), raterB.as("b"))
        .groupBy("source", "a", "b")
        .agg(count(lit(1)).as("c"))
      kappaFromCells(cells)
    }
  )
}
