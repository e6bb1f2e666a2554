package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Byte-pair-encoding vocabulary induction over the corpus — the
  * tokenizer-training step between curation and model training
  * (LLM-pipeline north star; absent from the reference, SURVEY §2.4).
  *
  * BPE trains on the DISTINCT-WORD frequency table, not the raw corpus
  * (Sennrich et al., ACL 2016 — public method): the iterative state is
  * one row per distinct word, so at 100 TB the loop's working set is
  * vocabulary-sized (millions of rows) while the corpus contributes only
  * the one word-count aggregation up front. Per merge round:
  *  - the pair count is ONE map-side-combined aggregation keyed by
  *    symbol pair — shuffle ∝ distinct adjacent pairs, never corpus;
  *  - the argmax pair is a bounded driver fetch of a single row (the
  *    k-means-centroid pattern: model state on the driver, data stays
  *    distributed);
  *  - the merge rewrite is a narrow per-row fold (no UDF — a
  *    higher-order `aggregate` implementing greedy left-to-right,
  *    non-overlapping pair replacement);
  *  - `localCheckpoint` after each round keeps the plan flat so round
  *    r+1 doesn't re-execute rounds 1..r (on a cluster: `checkpoint`
  *    to reliable storage).
  * Applying a trained vocabulary (`segment`) is a pure narrow map with
  * the merge list folded in as literals — broadcast-sized model state,
  * codegen-evaluated, no shuffle.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String)

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Distinct words of `documents.text` with corpus frequencies. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Greedy left-to-right, non-overlapping replacement of the adjacent
    * symbol pair (l, r) by the merged symbol l+r — as a fold, so it
    * stays a codegen'd expression: the accumulator's LAST element is
    * `l` exactly when a merge is possible, and a just-merged symbol
    * (l+r, strictly longer than l) can never retrigger on its own
    * left side, which is precisely BPE's non-overlap rule. */
  def mergePair(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && try_element_at(acc, lit(-1)) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of a symbol array, as (l, r) structs. */
  private def adjacentPairs(sym: Column): Column =
    transform(sequence(lit(0), size(sym) - 2), i =>
      struct(element_at(sym, i + 1).as("l"), element_at(sym, i + 2).as("r")))

  /** Train `nMerges` BPE merges over a (w, c) word-frequency table.
    * Deterministic: the argmax pair breaks count ties on (left, right)
    * lexicographic order, so the same corpus always yields the same
    * vocabulary. Stops early when no word has two symbols left. */
  def train(words: DataFrame, nMerges: Int): Seq[Merge] = {
    var sym = words
      .select(col("w"), col("c"), split(col("w"), "").as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.Buffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best = sym.filter(size(col("sym")) >= 2)
        .select(col("c"), explode(adjacentPairs(col("sym"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("c").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .head(1)
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(rank, l, r)
        val next = sym
          .select(col("w"), col("c"), mergePair(col("sym"), l, r).as("sym"))
          .localCheckpoint(true)
        sym.unpersist(blocking = false)
        sym = next
        rank += 1
      }
    }
    sym.unpersist(blocking = false)
    merges.toSeq
  }

  /** Segment a word column with a trained merge list: character split,
    * then each merge applied in rank order — the exact replay of
    * training, folded into one expression tree (merge list = broadcast
    * literals; depth ∝ nMerges, bounded model state). */
  def segment(w: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(split(w, ""))((acc, m) => mergePair(acc, m.left, m.right))

  /** Persist a trained merge table as (rank, left, right) parquet —
    * the tokenizer registry: training runs once, every later encode job
    * loads a KB-sized table ([[KMeans.Model.save]] posture). */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right)).toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table persisted by [[saveMerges]], in rank order. */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy("rank")
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq

  /** Train-once memo per (session, sf-dir) — q96/q98 share one corpus
    * and therefore one vocabulary (the q43 fittedModel posture). */
  private val trained =
    scala.collection.concurrent.TrieMap.empty[(String, String), Seq[Merge]]
  private[operators] def trainedMerges(s: SparkSession, dir: String): Seq[Merge] =
    graft.BuildMetrics.memo(trained,
      (graft.SessionMemo.key(s), dir), "bpe_merges")(
      train(wordFreqs(t(s, dir, "documents")), nMerges = 10))

  /** DuckDB replica of [[train]]'s ten merge rounds — closing two of the
    * r5 no-oracle rows (VERDICT #5): the trainer is deterministic string
    * arithmetic, so it IS SQL-expressible, unrolled one CTE triple per
    * round the way the q81 oracle unrolls PageRank iterations.
    *
    *  - `p{k}`: corpus-weighted adjacent-pair counts over round k−1's
    *    symbol table (the q95 statistic, re-derived per round);
    *  - `b{k}`: the argmax pair, ties on (count DESC, l, r) — the exact
    *    [[train]] tiebreak;
    *  - `s{k}`: greedy left-to-right non-overlapping merge application.
    *    SQL has no per-row fold, so the symbol list round-trips through
    *    a delimited string: each symbol is wrapped chr(1)·s·chr(2), and
    *    plain `replace` of wrap(l)·wrap(r) → wrap(l||r) IS the BPE merge
    *    rule — string replace scans left-to-right and resumes AFTER each
    *    replacement, so a just-merged symbol can never re-trigger as a
    *    left side, exactly [[mergePair]]'s accumulator guard. Wrapping
    *    each symbol separately (no shared boundary character) is what
    *    makes consecutive occurrences (l r l r) merge pairwise; a
    *    single-separator join would consume the shared boundary and miss
    *    every second occurrence. chr(1)/chr(2) cannot collide with
    *    corpus text (verified: no control chars in `documents`).
    *
    * `AS MATERIALIZED` on every CTE is load-bearing: each round
    * references its predecessor twice (pair stats + rewrite), and
    * DuckDB's default CTE inlining doubles the tree per round — 2^10
    * copies of s0 (measured: >5 min; materialized: 0.35 s). */
  private[operators] val bpeCtes: String = {
    val base =
      """w AS MATERIALIZED (SELECT tok, count(*) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |    FROM documents) GROUP BY tok),
        |s0 AS MATERIALIZED (SELECT tok, c, list_transform(range(length(tok)),
        |    i -> substr(tok, CAST(i+1 AS INT), 1)) AS sym FROM w)""".stripMargin
    val rounds = (1 to 10).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS MATERIALIZED (SELECT sym[CAST(i+1 AS INT)] AS l,
         |    sym[CAST(i+2 AS INT)] AS r, sum(c) AS cnt
         |  FROM $prev, unnest(range(len(sym)-1)) AS u(i) GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |s$k AS MATERIALIZED (SELECT tok, c, regexp_extract_all(
         |    replace(array_to_string(list_transform(sym, x -> chr(1)||x||chr(2)), ''),
         |      (SELECT chr(1)||l||chr(2)||chr(1)||r||chr(2) FROM b$k),
         |      (SELECT chr(1)||l||r||chr(2) FROM b$k)),
         |    chr(1)||'([^'||chr(2)||']*)'||chr(2), 1) AS sym FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  val queries: Seq[QueryDef] = Seq(

    /** The first BPE iteration as an oracle-checkable query: corpus-
      * weighted adjacent character-pair counts over the distinct-word
      * table, top 25 by (count DESC, pair ASC) — pins the exact pair
      * statistics the iterative trainer ranks on, cross-engine. The
      * Spark side guards 1-char words (Spark's sequence(1, 0) counts
      * DOWN, unlike DuckDB's empty range). */
    QueryDef("q95_bpe_pairs",
      """WITH w AS (SELECT tok, count(*) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |    FROM documents) GROUP BY tok),
        |p AS (SELECT c, unnest(list_transform(range(length(tok) - 1),
        |    i -> substr(tok, CAST(i + 1 AS INTEGER), 2))) AS pair FROM w)
        |SELECT pair, CAST(sum(c) AS BIGINT) AS cnt FROM p
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 25"""
        .stripMargin.replace("\n", " ")
    ) { (s, dir) =>
      val words = wordFreqs(t(s, dir, "documents"))
        .withColumnRenamed("w", "tok")
      words
        .select(col("c"), explode(
          when(length(col("tok")) >= 2,
            transform(sequence(lit(1), length(col("tok")) - 1), i =>
              col("tok").substr(i, lit(2))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(sum("c").cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(25)
    },

    /** Ten trained merges as (rank, left, right, merged). Oracle-checked
      * against the [[bpeCtes]] DuckDB replica of the trainer (r5 VERDICT
      * #5 — this row was no-oracle through round 5); `BpeSpec`
      * additionally pins the sequence against an independent in-memory
      * reference implementation and run-to-run determinism. */
    QueryDef("q96_bpe_merges", {
      val sel = (1 to 10).map(k =>
        s"""SELECT $k AS rank, l AS "left", r AS "right", l||r AS merged FROM b$k""")
        .mkString(" UNION ALL ")
      s"WITH $bpeCtes SELECT * FROM ($sel) ORDER BY rank".replace("\n", " ")
    }) { (s, dir) =>
      import s.implicits._
      trainedMerges(s, dir)
        .map(m => (m.rank, m.left, m.right, m.left + m.right))
        .toDF("rank", "left", "right", "merged")
    },

    /** Apply the trained vocabulary back to the corpus: per-language
      * piece counts (symbols after 10 merges) vs raw character count —
      * the compression-ratio report a tokenizer team reads before
      * freezing a vocabulary. Segmentation is deterministic per WORD,
      * so the merge fold runs once per distinct (lang, word) and the
      * totals weight by occurrence count — the dictionary-apply shape
      * (measured: folding every token instance instead costs 11.4s at
      * sf0.1 vs well under 1s this way, and at real scale instances
      * outnumber vocabulary by orders of magnitude). Oracle: the final
      * [[bpeCtes]] symbol table s10 IS the segmentation of every
      * distinct word, so the per-language report follows from one join
      * against the (lang, word) counts (r5 VERDICT #5). */
    QueryDef("q98_bpe_apply",
      (s"WITH $bpeCtes," +
        """
          |lw AS (SELECT lang, tok2 AS w2, count(*) AS n FROM (
          |    SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok2
          |    FROM documents) GROUP BY 1, 2)
          |SELECT lang, CAST(sum(n * length(w2)) AS BIGINT) AS n_chars,
          |       CAST(sum(n * len(seg.sym)) AS BIGINT) AS n_pieces,
          |       round(CAST(sum(n * len(seg.sym)) AS DOUBLE) /
          |             CAST(sum(n * length(w2)) AS DOUBLE), 6) AS pieces_per_char
          |FROM lw JOIN s10 seg ON lw.w2 = seg.tok
          |GROUP BY lang ORDER BY lang""".stripMargin).replace("\n", " ")
    ) { (s, dir) =>
      val merges = trainedMerges(s, dir)
      val words = t(s, dir, "documents")
        .select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      val pieces = words.select(col("lang"), col("n"),
        (col("n") * length(col("w"))).cast("long").as("chars"),
        (col("n") * size(segment(col("w"), merges))).cast("long")
          .as("pieces"))
      pieces.groupBy("lang")
        .agg(sum("chars").as("n_chars"), sum("pieces").as("n_pieces"),
          round(sum("pieces") / sum("chars").cast("double"), 6)
            .as("pieces_per_char"))
        .orderBy("lang")
    }
  )
}
