package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.PublicSuffixParse

/** Provenance-tier curation: registered-domain extraction and the
  * domain-keyed operators production pipelines gate on BEFORE any text
  * runs (RefinedWeb §3.1 dedups by URL before content; per-domain caps
  * are the first flood guard). The corpus tables carry no URL column,
  * so each document's host derives deterministically from `doc_id` —
  * the c4Report planting posture: the DERIVATION is trivial and shared
  * with the oracle verbatim; the operators under test (public-suffix
  * longest-match, domain caps, domain dedup rollup) are the real thing.
  *
  * Shape at 100 TB: suffix parsing is pure row-local arithmetic over a
  * bounded rule list (the published PSL is ~9k entries — broadcast
  * data, not a join), so provenance extraction fuses into the scan;
  * every domain-keyed aggregate downstream is bounded by |domains|,
  * with the hot-domain skew handled exactly as q109 handles hot
  * sources (bounded aggregation buffers, never a per-domain window
  * sort). */
object Provenance {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.sources.Tables.load(s, dir, n)

  /** Bounded stand-in for the publicsuffix.org list, loaded as DATA
    * from a resource file in the published list's own line format —
    * the production swap-in is the ~9k-entry published file dropped in
    * at the same path. Plain rules with real longest-match nesting
    * (`uk`/`co.uk`, `io`/`github.io`, a three-label rule) plus the
    * PSL's own wildcard/exception examples (`*.ck`, `!www.ck`,
    * `*.kawasaki.jp`) so every branch of the matching algorithm runs
    * against the gate. Nothing below depends on the list's size. */
  /** The published list's line format: one rule per line, `//`
    * comments, blank lines ignored. ONE parser for the shipped
    * stand-in and any swapped-in production file (the PSL scale spec
    * loads a generated ~9k-rule file through this same path). */
  private[graft] def parseRuleLines(lines: Iterator[String]): List[String] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList

  private[graft] val suffixRules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_standin.dat")
    require(in != null, "public_suffix_standin.dat resource missing")
    try parseRuleLines(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** The three PSL rule classes of [[suffixRules]], split once for the
    * oracle's list-as-table replay (the same parse
    * [[graft.functions.PublicSuffixParse]] runs on its constructor
    * argument): (plain, wildcard bases, exception names). */
  private val (plainRules, wildcardBaseRules, exceptionRules) = {
    val lower = suffixRules.map(_.toLowerCase)
    (lower.filterNot(r => r.startsWith("!") || r.startsWith("*.")),
      lower.filter(_.startsWith("*.")).map(_.substring(2)),
      lower.filter(_.startsWith("!")).map(_.substring(1)))
  }

  /** Deterministic per-document host (both engines replay it verbatim):
    * subdomain / site-name / suffix each keyed off doc_id so the corpus
    * covers multi-label suffixes, the private-section trap, an unknown
    * TLD (`xyz` — exercises the PSL default rule), and — every 97th doc
    * — one of five trap hosts cycling by doc_id/97: a host that IS a
    * bare public suffix (no registrable part), the `!www.ck` exception
    * (registrable WITH a suffix carved out of the wildcard), a host the
    * `*.ck` wildcard makes a bare suffix, a host one label under it
    * (registrable under the wildcard suffix), and a `*.kawasaki.jp`
    * bare-suffix host sitting UNDER the plain `jp` rule. */
  private[graft] def syntheticHost(docId: Column): Column =
    when(pmod(docId, lit(97)) === 0,
      element_at(array(lit("github.io"), lit("www.ck"), lit("foo.ck"),
        lit("a.b.ck"), lit("demo.kawasaki.jp")),
        (pmod(call_function("div", docId.cast("long"), lit(97L)),
          lit(5)) + 1).cast("int")))
      .otherwise(concat(
        element_at(array(lit(""), lit("www."), lit("cdn.")),
          (pmod(docId, lit(3)) + 1).cast("int")),
        lit("site"), pmod(docId, lit(20)).cast("string"), lit("."),
        element_at(
          array(lit("com"), lit("org"), lit("co.uk"), lit("ac.jp"),
            lit("github.io"), lit("xyz")),
          (pmod(docId, lit(6)) + 1).cast("int"))))

  private val hostSql: String =
    """CASE WHEN doc_id % 97 = 0 THEN
      |  (CASE (doc_id // 97) % 5 WHEN 0 THEN 'github.io'
      |      WHEN 1 THEN 'www.ck' WHEN 2 THEN 'foo.ck'
      |      WHEN 3 THEN 'a.b.ck' ELSE 'demo.kawasaki.jp' END)
      |ELSE
      |  (CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'cdn.' END)
      |  || 'site' || CAST(doc_id % 20 AS VARCHAR) || '.'
      |  || (CASE doc_id % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |      WHEN 2 THEN 'co.uk' WHEN 3 THEN 'ac.jp'
      |      WHEN 4 THEN 'github.io' ELSE 'xyz' END) END"""
      .stripMargin.replace("\n", " ")

  private def sqlList(rules: Seq[String]): String =
    if (rules.isEmpty) "''" // never matches a non-empty label set
    else rules.map(s => s"'$s'").mkString(", ")

  /** The oracle's replay of [[PublicSuffixParse]]: candidate suffixes of
    * each host joined against the three rule classes AS TABLES under the
    * full publicsuffix.org algorithm — an exception match prevails
    * (suffix = rule minus its leftmost label); otherwise the longest
    * plain-or-wildcard match (`*` = exactly one label, so a wildcard
    * needs i < nl); otherwise the default `*` rule. Identical
    * registered/suffix arithmetic to the expression. Shared by every
    * domain oracle. */
  private val domainCtes: String =
    s"""hh AS (SELECT doc_id, $hostSql AS host FROM documents),
       |hl AS (SELECT doc_id, host, string_split(host, '.') AS labels FROM hh),
       |hc AS (SELECT doc_id, CAST(u.i AS INT) AS i, len(labels) AS nl,
       |    array_to_string(labels[CAST(u.i AS INT):], '.') AS cand,
       |    array_to_string(labels[CAST(u.i + 1 AS INT):], '.') AS tail
       |  FROM hl, unnest(range(1, len(labels) + 1)) AS u(i)),
       |hx AS (SELECT doc_id, min(i) AS xi FROM hc
       |  WHERE cand IN (${sqlList(exceptionRules)}) GROUP BY 1),
       |hm AS (SELECT doc_id, min(i) AS bi FROM hc
       |  WHERE cand IN (${sqlList(plainRules)})
       |     OR (i < nl AND tail IN (${sqlList(wildcardBaseRules)}))
       |  GROUP BY 1),
       |rd AS (SELECT hl.doc_id, hl.host,
       |    CASE WHEN hx.xi IS NOT NULL
       |           THEN array_to_string(labels[CAST(hx.xi AS INT):], '.')
       |         WHEN hm.bi = 1 OR (hm.bi IS NULL AND len(labels) < 2) THEN NULL
       |         WHEN hm.bi IS NOT NULL
       |           THEN array_to_string(labels[CAST(hm.bi - 1 AS INT):], '.')
       |         ELSE array_to_string(labels[CAST(len(labels) - 1 AS INT):], '.')
       |         END AS registered_domain,
       |    CASE WHEN hx.xi IS NOT NULL
       |           THEN array_to_string(labels[CAST(hx.xi + 1 AS INT):], '.')
       |         WHEN hm.bi = 1 THEN host
       |         WHEN hm.bi IS NOT NULL
       |           THEN array_to_string(labels[CAST(hm.bi AS INT):], '.')
       |         ELSE labels[len(labels)] END AS public_suffix
       |  FROM hl LEFT JOIN hm ON hl.doc_id = hm.doc_id
       |    LEFT JOIN hx ON hl.doc_id = hx.doc_id)"""
      .stripMargin.replace("\n", " ")

  /** doc_id → registered_domain, shared by the queries below and the
    * streaming occupancy view (one code path for the grouping key). */
  private[graft] def registeredDomain(docId: Column): Column =
    PublicSuffixParse(syntheticHost(docId), suffixRules)
      .getField("registered_domain")

  /** THE token count of the provenance tier — one definition shared by
    * batch q150, the streaming token-budget view and the streaming
    * occupancy gauge (r10 ADVICE: the three had drifted between
    * filtered and unfiltered split forms, so the live gauge and the
    * budget disagreed on the same document). The filtered form: split
    * on whitespace and drop empty tokens, so a blank document counts 0
    * tokens — the q139 empty-text posture. Oracle replica:
    * [[tokenCountSql]]. */
  private[graft] def tokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => length(t) > 0))
      .cast("long")

  /** DuckDB replay of [[tokenCount]] over a column reference. */
  private[graft] def tokenCountSql(col: String): String =
    s"len(list_filter(regexp_split_to_array(trim($col), '\\s+'), t -> t <> ''))"

  /** The opt-out domain list (bounded stand-in for aggregated
    * robots/ai.txt consent data) and q149's membership test, shared
    * with the streaming gate view — one code path. A null registered
    * domain is NOT opted out (no publisher to match). The three
    * entries are residues the host synth actually emits (doc_id ≡ 24,
    * 2, 28 mod 60 respectively — the name and suffix schedules share
    * parity, so e.g. site1.com never occurs), one per suffix class. */
  private[graft] val optOutDomains: Seq[String] =
    Seq("site4.com", "site2.co.uk", "site8.github.io")

  private[graft] def optedOut(registeredDomain: Column): Column =
    coalesce(registeredDomain.isInCollection(optOutDomains), lit(false))

  /** q150's admission arithmetic over a (rd, qb, n_docs, n_tokens)
    * bucket-count frame, shared with the streaming budget view (one
    * code path, pinned once): cumulative token totals best-bucket-first
    * per domain, whole buckets admitted while the running total fits
    * `budget`. The window's input is the BOUNDED bucket table (domains
    * × ≤101 rows), never documents. */
  private[graft] def budgetReport(bucketCounts: DataFrame,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("rd").orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = col("cum_tok") <= budget
    bucketCounts.withColumn("cum_tok", sum("n_tokens").over(w))
      .groupBy("rd")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        min(when(kept, col("qb"))).as("threshold_qb"),
        coalesce(sum(when(kept, col("n_docs"))), lit(0L))
          .as("n_docs_kept"),
        coalesce(sum(when(kept, col("n_tokens"))), lit(0L))
          .as("n_tokens_kept"))
      .withColumnRenamed("rd", "registered_domain")
  }

  /** Deterministic per-document URL for q147 (the q93 plant posture:
    * the derivation is trivial and replayed verbatim by the oracle; the
    * operator under test is the normalization). Scheme, a www prefix,
    * a tracking query string, and a trailing slash each vary on their
    * own doc_id schedule, while the normalization-invariant core
    * (site name mod 25, path mod 50) repeats every 50 ids — so the
    * corpus plants groups of raw-distinct URLs that normalize
    * identically, which is exactly the crawl-frontier shape URL dedup
    * exists for (the same page reached as http/https, with/without
    * www, with/without utm_* decoration). */
  private[graft] def syntheticUrl(docId: Column): Column = concat(
    when(pmod(docId, lit(2)) === 0, lit("https://")).otherwise(lit("http://")),
    when(pmod(docId, lit(4)) < 2, lit("")).otherwise(lit("www.")),
    lit("site"), pmod(docId, lit(25)).cast("string"),
    lit(".com/p/"), pmod(docId, lit(50)).cast("string"),
    when(pmod(docId, lit(5)) === 0, lit("?utm_source=feed")).otherwise(lit("")),
    when(pmod(docId, lit(7)) === 0, lit("/")).otherwise(lit("")))

  private val urlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
      | || (CASE WHEN doc_id % 4 < 2 THEN '' ELSE 'www.' END)
      | || 'site' || CAST(doc_id % 25 AS VARCHAR)
      | || '.com/p/' || CAST(doc_id % 50 AS VARCHAR)
      | || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END)
      | || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)"""
      .stripMargin.replace("\n", " ")

  /** URL canonicalization for dedup keying: strip scheme, a leading
    * www., the query string (tracking parameters are the usual
    * offender), and trailing slashes, then lowercase. Order matters —
    * the query strip runs before the slash strip so `?utm=.../`
    * disappears whole. Pure regexp_replace chain (codegen'd; both
    * engines implement the same anchored-regex semantics), shared with
    * the streaming URL-dedup view. */
  private[graft] def normalizeUrl(url: Column): Column = lower(
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
      "^https?://", ""), "^www\\.", ""), "\\?.*$", ""), "/+$", ""))

  val queries: Seq[QueryDef] = Seq(

    /** Registered-domain extraction audit: every document's host parsed
      * into (registered_domain, public_suffix) — the provenance column
      * the rest of the tier keys on. One narrow scan-fused projection;
      * the native [[PublicSuffixParse]] does one label walk per row
      * against the bounded rule set while the oracle re-derives the
      * longest match as a join against the rules-as-table. */
    QueryDef("q143_registered_domain",
      s"""WITH $domainCtes
         |SELECT doc_id, host, registered_domain, public_suffix FROM rd"""
        .stripMargin.replace("\n", " ")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), syntheticHost(col("doc_id")).as("host"))
        .withColumn("p", PublicSuffixParse(col("host"), suffixRules))
        .select(col("doc_id"), col("host"),
          col("p.registered_domain"), col("p.public_suffix"))
    },

    /** Per-DOMAIN document cap — q109's flood guard moved to the
      * provenance tier, where it actually runs in production (capping
      * by `source` treats all of one crawl as one publisher; capping by
      * registered domain is what stops a single site from flooding the
      * corpus). Same bounded-buffer shape as q109: keep the top 5 docs
      * per registered domain by quality via [[graft.functions
      * .TopKAggregator]] — ≤ 5 entries in the aggregation buffer, so a
      * million-page domain ships the same shuffle bytes as a five-page
      * one, with no per-domain window sort anywhere. Docs with no
      * registrable domain (bare-suffix hosts) carry no publisher
      * identity and are excluded from the cap — stated in the oracle's
      * WHERE too. */
    QueryDef("q144_domain_cap",
      s"""WITH $domainCtes,
         |q AS (SELECT rd.registered_domain, d.doc_id,
         |    ${TextAnalysis.qualityScoreSql} AS quality
         |  FROM documents d JOIN rd ON d.doc_id = rd.doc_id
         |  WHERE rd.registered_domain IS NOT NULL),
         |r AS (SELECT registered_domain, doc_id, quality,
         |    row_number() OVER (PARTITION BY registered_domain
         |                       ORDER BY quality DESC, doc_id) AS rk
         |  FROM q)
         |SELECT registered_domain, doc_id, quality, rk FROM r WHERE rk <= 5"""
        .stripMargin.replace("\n", " ")) { (s, dir) =>
      val topk = udaf(new graft.functions.TopKAggregator(5))
      t(s, dir, "documents")
        .select(registeredDomain(col("doc_id")).as("registered_domain"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          col("doc_id"))
        .filter(col("registered_domain").isNotNull)
        .groupBy("registered_domain")
        .agg(topk(col("quality"), col("doc_id")).as("top"))
        .select(col("registered_domain"), posexplode(col("top")))
        .select(col("registered_domain"), col("col.id").as("doc_id"),
          col("col.score").as("quality"),
          (col("pos") + 1).cast("long").as("rk"))
    },

    /** Domain-level dedup audit — q106's per-source rollup re-keyed to
      * the provenance tier: for every registered domain, how many
      * documents, how many sit in at least one near-dup pair, and the
      * duplicate rate (the "which domains are template farms" read a
      * corpus operator takes before deciding domain caps). Another free
      * reader of the session-scoped shared pair table: incremental cost
      * is one pair-endpoint distinct + a domain-keyed bounded aggregate;
      * the oracle re-derives the pair set all-pairs as q106's does.
      * Bare-suffix docs group under NULL — one audit row, kept (their
      * dup rate is still signal). */
    QueryDef("q145_domain_dedup",
      s"""WITH $domainCtes,
        |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(greatest(len(w)-2,0)),
        |        i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS sh FROM w),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE len(a.sh) > 0 AND len(b.sh) > 0 AND len(list_intersect(a.sh, b.sh)) * 1.0 /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
        |dup AS (SELECT DISTINCT doc_id FROM
        |  (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b FROM p))
        |SELECT rd.registered_domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(dup.doc_id) AS BIGINT) AS n_dup_docs,
        |  round(count(dup.doc_id) * 1.0 / count(*), 6) AS dup_rate
        |FROM rd LEFT JOIN dup ON rd.doc_id = dup.doc_id
        |GROUP BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val dom = t(s, dir, "documents")
        .select(col("doc_id"),
          registeredDomain(col("doc_id")).as("registered_domain"))
      val pairs = Dedup.sharedNearDupPairs(s, dir, 0.8, bandRows = 2,
        nBands = 32)
      val dupDocs = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id")))
        .distinct()
        .withColumn("dup", lit(1L))
      dom.join(dupDocs, Seq("doc_id"), "left")
        .groupBy("registered_domain")
        .agg(count(lit(1)).as("n_docs"),
          count(col("dup")).as("n_dup_docs"),
          round(count(col("dup")) * 1.0 / count(lit(1)), 6).as("dup_rate"))
    },

    /** Opt-out policy gate — the compliance member of the provenance
      * tier: documents whose registered domain appears on the opt-out
      * list (the bounded stand-in for aggregated robots.txt / ai.txt
      * crawl-consent results, which production pipelines honor at the
      * PUBLISHER granularity — every subdomain and page of an opted-out
      * domain goes, which is exactly why the key is the registered
      * domain and not the host) are flagged for removal. Docs with no
      * registrable domain cannot be matched to a publisher's opt-out
      * and pass this gate (provenance-less traffic is someone else's
      * drop rule). Pure row-local: the suffix parse fuses at the scan
      * and the list probe is an IN over broadcast data — no join, no
      * shuffle; the oracle replays the same membership over the
      * list-as-table semantics via IN. */
    QueryDef("q149_optout_gate",
      s"""WITH $domainCtes
         |SELECT doc_id, registered_domain,
         |  coalesce(registered_domain IN (${optOutDomains
            .map(d => s"'$d'").mkString(", ")}), FALSE) AS opted_out
         |FROM rd""".stripMargin.replace("\n", " ")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          registeredDomain(col("doc_id")).as("registered_domain"))
        .withColumn("opted_out", optedOut(col("registered_domain")))
    },

    /** Budget-constrained per-domain selection — q144's doc-count cap
      * generalized to the unit that actually costs money: keep, per
      * registered domain, the highest-quality documents whose TOKEN
      * total fits a per-domain budget (the "no publisher buys more
      * than B tokens of the run" rule a mixture planner hands down).
      * Selection is by whole quality BUCKET (floor(quality·100), ≤ 101
      * buckets): admit buckets best-first while the running token
      * total stays within budget. Whole-bucket admission is the
      * deterministic, scale-correct form — per-doc greedy would need a
      * per-domain total order over documents (the hot-domain sort
      * q109/q144 exist to avoid); bucket granularity costs at most one
      * bucket of under-fill and keeps everything exact-integer.
      *
      * Shape at 100 TB: one map-side-combinable (domain, bucket)
      * aggregate over the corpus, then the cumulative window runs over
      * the BOUNDED bucket table (domains × ≤101 rows — the q110/q112
      * move), never over documents; the final rollup is domain-keyed.
      * A domain whose best bucket alone busts the budget keeps nothing
      * (threshold_qb NULL, zero kept) — stated in both engines. */
    QueryDef("q150_token_budget",
      s"""WITH $domainCtes,
         |d AS (SELECT rd.registered_domain AS rd,
         |    CAST(floor(${TextAnalysis.qualityScoreSql} * 100) AS INT) AS qb,
         |    CAST(${tokenCountSql("text")} AS BIGINT) AS n_tok
         |  FROM documents doc JOIN rd ON doc.doc_id = rd.doc_id
         |  WHERE rd.registered_domain IS NOT NULL),
         |g AS (SELECT rd, qb, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |  FROM d GROUP BY 1, 2),
         |c AS (SELECT rd, qb, n_docs, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY rd ORDER BY qb DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tok
         |  FROM g)
         |SELECT rd AS registered_domain,
         |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(CASE WHEN cum_tok <= 500 THEN qb END) AS threshold_qb,
         |  CAST(coalesce(sum(CASE WHEN cum_tok <= 500 THEN n_docs END), 0)
         |    AS BIGINT) AS n_docs_kept,
         |  CAST(coalesce(sum(CASE WHEN cum_tok <= 500 THEN n_tokens END), 0)
         |    AS BIGINT) AS n_tokens_kept
         |FROM c GROUP BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(registeredDomain(col("doc_id")).as("rd"),
          floor(TextAnalysis.qualityScore(col("text")) * 100)
            .cast("int").as("qb"),
          tokenCount(col("text")).as("n_tok"))
        .filter(col("rd").isNotNull)
      budgetReport(
        d.groupBy("rd", "qb")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens")),
        budget = 500L)
    },

    /** URL-level exact dedup — the FIRST dedup stage RefinedWeb §3.1
      * runs, before any content hashing: the same page reached as
      * http/https, with/without www, with tracking parameters or a
      * trailing slash, is one document, and dropping re-crawls by URL
      * key is orders of magnitude cheaper than text comparison (no
      * tokenization, no shingles — a regexp chain and a groupBy on
      * short keys). Output per canonical URL: the kept doc (min id),
      * copy count, and how many RAW spellings collapsed into the key —
      * rows with n_raw_variants > 1 are exactly the catches a naive
      * raw-URL groupBy misses.
      *
      * Shape at 100 TB: identical to q20/q137 — normalization is a
      * narrow per-row map fused at the scan, and the shuffle moves
      * short URL keys, never documents. */
    QueryDef("q147_url_dedup",
      s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
         |n AS (SELECT doc_id, url,
         |    lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
         |      '^https?://', ''), '^www\\.', ''), '\\?.*$$', ''), '/+$$', '')) AS url_key
         |  FROM u)
         |SELECT url_key, min(doc_id) AS keep_id, count(*) AS n_copies,
         |  count(DISTINCT url) AS n_raw_variants
         |FROM n GROUP BY 1""".stripMargin.replace("\n", " ")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), syntheticUrl(col("doc_id")).as("url"))
        .withColumn("url_key", normalizeUrl(col("url")))
        .groupBy("url_key")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
          countDistinct(col("url")).as("n_raw_variants"))
    }
  )
}
