package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the first
  * LLM-training-pipeline family (north star beyond reference parity;
  * the reference itself has no text tooling, SURVEY §2.4).
  *
  * Scale design (the point of each operator):
  *  - exact dedup: group by a 256-bit content hash, never by the full
  *    text — the shuffle moves 32-byte keys, not documents.
  *  - MinHash+LSH near-dup: banded signature buckets → candidate pairs →
  *    exact verify. NEVER all-pairs: candidate generation is a self-join
  *    on (band_id, band_hash) buckets, so work scales with collisions,
  *    not n². Verification joins back only the candidate doc ids.
  *  - SimHash: 64-bit signature; near-dup candidates via 4×16-bit band
  *    blocking (hamming ≤ 3 ⇒ at least one band equal), then exact
  *    hamming verify on the candidates.
  *  - character n-gram Jaccard: rare-gram blocking (each doc keyed by its
  *    k rarest grams) then exact verify — bounded fan-out per doc.
  */
object Dedup {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = split(trim(text), "\\s+")
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
        .otherwise(array()))
  }

  /** |A∩B| / |A∪B| from two distinct-element arrays (integer set sizes →
    * one exact double division, identical across engines). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  // deterministic universal-hash parameters for 64 MinHash permutations:
  // h_i(x) = (a_i * x + b_i) mod p over a base shingle hash reduced mod p.
  // p = 2^31-1 keeps a_i*x < 2^62 — no long overflow.
  private val P = 2147483647L
  private val perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(64)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature columns m0..m63 for an exploded (doc_id, shingle)
    * frame: one aggregation, 64 codegen'd min() columns — a single
    * map-side-combinable shuffle keyed by doc_id. */
  private def minhashSignature(exploded: DataFrame): DataFrame = {
    val h0 = pmod(xxhash64(col("shingle")), lit(P))
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(h0 * lit(a) + lit(b), lit(P))).as(s"m$i")
    }
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  val queries: Seq[QueryDef] = Seq(

    /** Exact dedup by content hash: one row per distinct text with the
      * surviving (minimum) doc id and the duplicate count. */
    QueryDef("q20_dedup_exact",
      "SELECT sha256(text) AS fp, min(doc_id) AS keep_id, " +
        "count(*) AS dup_cnt FROM documents GROUP BY 1") { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
    },

    /** MinHash+LSH near-duplicate pairs, exact-verified at jaccard ≥ 0.8
      * on word 3-shingles. Bands: 32 bands × 2 rows — P(candidate | j) =
      * 1-(1-j²)^32, i.e. a ≥0.8 pair is missed with probability < 1e-14,
      * so the verified output equals the exact all-pairs answer (which is
      * what the DuckDB oracle computes — the oracle may go O(n²), the
      * engine must not). */
    QueryDef("q21_minhash_lsh",
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(greatest(len(w)-2,0)),
        |        i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS sh FROM w)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       len(list_intersect(a.sh, b.sh)) * 1.0 /
        |         (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
        |""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), shingles(col("text")).as("sh"))
      val exploded = docs.select(col("doc_id"),
        explode(col("sh")).as("shingle"))
      val sig = minhashSignature(exploded)

      // 32 bands of 2 rows: band hash = xxhash64(band_id, m_{2j}, m_{2j+1})
      val bands = (0 until 32).map { j =>
        struct(lit(j).as("band_id"),
          xxhash64(lit(j), col(s"m${2 * j}"), col(s"m${2 * j + 1}"))
            .as("bh"))
      }
      val buckets = sig.select(col("doc_id"),
        explode(array(bands: _*)).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.bh"))

      // candidate pairs: bucket self-join (equi on band identity)
      val l = buckets.as("l")
      val r = buckets.as("r")
      val candidates = l.join(r,
        col("l.band_id") === col("r.band_id") &&
          col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()

      // exact verify on the candidates only
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      candidates.join(a, "doc_a").join(b, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
    },

    /** SimHash near-duplicate detection: 64-bit signature = sign bits of
      * the per-bit sum of word-hash bit vectors; candidates blocked on
      * 4×16-bit bands (hamming ≤ 3 guarantees ≥1 equal band), then exact
      * hamming verify ≤ 3. Approximate-by-design (engine-specific hash) —
      * covered by ScalaTest, not the SQL oracle. */
    QueryDef.noOracle("q22_simhash_pairs") { (s, dir) =>
      // features = word 3-shingles, not bare words: this corpus shares one
      // small vocabulary, so word-set signatures would collapse; shingle
      // sets separate (unrelated docs' shingle jaccard < 0.31 here)
      val words = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(shingles(col("text"))).as("word"))
        .withColumn("h", xxhash64(col("word")))
      // per-bit tally: bit k contributes +1 if set else -1
      val bitSums = (0 until 64).map { k =>
        sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"b$k")
      }
      val sig = words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(k =>
            when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(0L))
            .reduce(_.bitwiseOR(_)).as("simhash"))

      val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(j => struct(lit(j).as("band_id"),
          shiftright(col("simhash"), j * 16).bitwiseAND(0xffffL)
            .as("bh"))): _*)).as("band"))
        .select(col("doc_id"), col("simhash"),
          col("band.band_id"), col("band.bh"))

      val l = banded.as("l")
      val r = banded.as("r")
      val candidates = l.join(r,
        col("l.band_id") === col("r.band_id") &&
          col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          col("l.simhash").as("sim_a"), col("r.simhash").as("sim_b"))
        .distinct()
      candidates
        .withColumn("hamming",
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    },

    /** Character 5-gram Jaccard near-dup with rare-gram blocking: each doc
      * is keyed by its 8 globally-rarest grams; docs sharing a rare gram
      * become candidates (bounded fan-out — rare grams have few owners),
      * then exact char-gram Jaccard ≥ 0.7 verifies. The oracle computes
      * the same measure exhaustively. */
    QueryDef("q23_ngram_jaccard",
      """WITH g AS (SELECT doc_id, list_distinct(list_transform(range(greatest(len(text)-4,0)),
        |        i -> substr(text, CAST(i+1 AS INT), 5))) AS gs FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       len(list_intersect(a.gs, b.gs)) * 1.0 /
        |         (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) AS jaccard
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.gs, b.gs)) * 1.0 /
        |        (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.7
        |""".stripMargin.replace("\n", " ")) { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
          i => col("text").substr(i, lit(5)))).as("gs"))

      // rare-gram blocking: key each doc by its 8 globally-rarest grams;
      // fan-out per gram is bounded (rare ⇒ few owners), so the candidate
      // join cannot go quadratic on common grams
      val exploded = docs.select(col("doc_id"), explode(col("gs")).as("g"))
      val freq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
      val rare = exploded.join(freq, "g")
        .groupBy("doc_id")
        .agg(slice(array_sort(collect_list(struct(col("df"), col("g")))),
          1, 8).as("rare"))
        .select(col("doc_id"), explode(col("rare.g")).as("g"))

      val l = rare.as("l")
      val r = rare.as("r")
      val candidates = l.join(r,
        col("l.g") === col("r.g") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()

      val a = docs.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"))
      candidates.join(a, "doc_a").join(b, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          jaccard(col("gs_a"), col("gs_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
    }
  )
}
