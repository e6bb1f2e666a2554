package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Near-dup operators verified against brute-force ground truth at
  * sf0.001/sf0.01 — LSH candidate generation must reproduce the exact
  * answer on the planted near-duplicates (the oracle only covers the
  * SQL-expressible members of the family). */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val queries = graft.SparkEntry.queries

  private lazy val bruteForcePairs: Set[(Long, Long)] = {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
  }

  test("shingles: distinct word 3-grams, short-text guard") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("minhash-LSH finds exactly the brute-force jaccard>=0.8 pairs") {
    val lsh = queries("q21_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == bruteForcePairs)
    assert(lsh.size == 25, "sf0.01 plants 25 near-dup pairs")
  }

  test("simhash pairs are true near-dups (subset of jaccard pairs)") {
    val sim = queries("q22_simhash_pairs")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(bruteForcePairs),
      "hamming<=3 must not produce false positives on this corpus")
    val hams = queries("q22_simhash_pairs")(spark, dir)
      .select("hamming").as[Long].collect()
    assert(hams.forall(_ <= 3))
  }

  test("clusterPairs reaches a fixpoint on a chain deeper than 6") {
    // planted duplicate CHAIN d000∼d001∼…∼d020: diameter 20, so any
    // fixed-round propagation ≤ 6 splits it; the fixpoint loop must not
    val pairs = (0 until 20)
      .map(i => (f"d$i%03d", f"d${i + 1}%03d")).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs)
      .as[(String, String)].collect().toMap
    assert(got.size == 21)
    assert(got.values.toSet == Set("d000"),
      s"one component labeled by its minimum, got: $got")

    // and two separate components stay separate
    val two = Seq(("a1", "a2"), ("a2", "a3"), ("z1", "z2"))
      .toDF("doc_a", "doc_b")
    val lbl = Dedup.clusterPairs(two).as[(String, String)].collect().toMap
    assert(lbl == Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "z1" -> "z1", "z2" -> "z1"))
  }

  test("clusterPairsStar: chain collapses in O(log n) rounds, not diameter") {
    // a 64-node chain has diameter 63 — label propagation needs ~63
    // rounds; alternating star contraction must finish in far fewer
    val chain = (0 until 63)
      .map(i => (f"d$i%03d", f"d${i + 1}%03d")).toDF("doc_a", "doc_b")
    val (_, rounds, _) = Dedup.starContract(chain, 100)
    assert(rounds <= 10, s"expected O(log n) rounds on a 64-chain, got $rounds")

    val got = Dedup.clusterPairsStar(chain)
      .as[(String, String)].collect().toMap
    assert(got.size == 64)
    assert(got.values.toSet == Set("d000"))
  }

  test("clusterPairsStar equals clusterPairs on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 30
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(50); val b = rnd.nextInt(50)
        (f"n$a%02d", f"n$b%02d")
      }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
      val star = Dedup.clusterPairsStar(pairs)
        .as[(String, String)].collect().toMap
      val prop = Dedup.clusterPairs(pairs)
        .as[(String, String)].collect().toMap
      assert(star == prop, s"trial $trial: star != propagation")
    }

    // two separate components stay separate
    val two = Seq(("a1", "a2"), ("a2", "a3"), ("z1", "z2"))
      .toDF("doc_a", "doc_b")
    val lbl = Dedup.clusterPairsStar(two).as[(String, String)].collect().toMap
    assert(lbl == Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "z1" -> "z1", "z2" -> "z1"))
  }

  test("char-gram LSH reproduces brute-force char-gram pairs") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
        i => col("text").substr(i, lit(5)))).as("gs"))
    val a = docs.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j", Dedup.jaccard(col("gs_a"), col("gs_b")))
      .filter(col("j") >= 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val blocked = queries("q23_ngram_jaccard")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(blocked == brute)
  }

  test("q59: every reported pair truly shares a verbatim 50-char run") {
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val pairs = queries("q59_substring_dup")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty) // the corpus plants near-dup pairs
    pairs.foreach { case (a, b) =>
      val (ta, tb) = (texts(a), texts(b))
      val windows = (0 to math.max(ta.length - 50, 0))
        .map(i => ta.substring(i, math.min(i + 50, ta.length))).toSet
      assert(windows.exists(w => w.length == 50 && tb.contains(w)),
        s"pair ($a,$b) shares no 50-char run")
    }
  }

  test("q83: prefix-filter containment equals brute force; catches the " +
      "low-jaccard quote-in-article pair LSH is blind to") {
    // planted asymmetry: "quote" is a verbatim 50-word slice of the
    // 400-word "article" — every word 3-shingle of the quote appears in
    // the article, so containment(quote→article) = 1.0 but jaccard
    // ≈ 0.12, far under every symmetric threshold in the q21–q23 family
    val words = (0 until 400).map(i => s"w${i % 97}x$i")
    val article = words.mkString(" ")
    val quote = words.slice(40, 90).mkString(" ")
    val others = (0 until 6).map(i =>
      (100 + i).toLong -> (0 until 80).map(j => s"o${i}y$j").mkString(" "))
    // boundary pair at containment = 9/10 = θ EXACTLY: doc 3 has 12
    // words → 10 shingles; doc 4 repeats its first 11 words (covering
    // shingles 1..9) then diverges — regression for the prefix-length
    // double-rounding bug (⌊(1−θ)·n⌋ = 0 at n=10) the gate caught
    val bWords = (0 until 12).map(i => s"b_w$i")
    val boundaryA = bWords.mkString(" ")
    val boundaryB = (bWords.take(11) ++ Seq("zq1", "zq2", "zq3")).mkString(" ")
    val docs = (Seq(1L -> article, 2L -> quote,
        3L -> boundaryA, 4L -> boundaryB) ++ others)
      .toDF("doc_id", "text")

    val exploded = docs.select(col("doc_id"),
      explode(graft.functions.NGrams.wordShingles(col("text"), 3)).as("f"))
    val got = Dedup.containmentPairs(exploded, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    val grams = docs.select(col("doc_id"),
      graft.functions.NGrams.wordShingles(col("text"), 3).as("gs"))
    val a = grams.select(col("doc_id").as("doc_a"), col("gs").as("ga"))
    val b = grams.select(col("doc_id").as("doc_b"), col("gs").as("gb"))
    val brute = a.crossJoin(b)
      .filter(col("doc_a") =!= col("doc_b"))
      .withColumn("c", size(array_intersect(col("ga"), col("gb")))
        .cast("double") / size(col("ga")))
      .filter(col("c") >= 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    assert(got == brute)
    assert(got.contains((2L, 1L)), "quote⊂article must be found")
    assert(!got.contains((1L, 2L)), "containment is asymmetric")
    assert(got.contains((3L, 4L)), "exactly-at-threshold pair must be found")
  }

  test("char_window_grams: positional windows, in order, non-distinct") {
    val out = Seq("abcdef", "abc", "aaaa").toDF("text")
      .select(graft.functions.NGrams.charWindowGrams(col("text"), 4).as("w"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("abcd", "bcde", "cdef"))
    assert(out(1) == Seq.empty, "shorter than n yields NO window (not the " +
      "CharGrams whole-string edge): no duplication evidence")
    assert(out(2) == Seq("aaaa"))
  }

  test("char_window_grams: windows and starts count CODE POINTS, not " +
      "UTF-16 units (non-BMP)") {
    // 😀 is a supplementary char (2 UTF-16 units, 1 code point): windows
    // of 4 code points, array index = code-point start — matching what
    // Spark substr/length and the DuckDB oracle count
    val out = Seq("😀😀abcd").toDF("text")
      .select(graft.functions.NGrams.charWindowGrams(col("text"), 4).as("w"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("😀😀ab",
      "😀abc", "abcd"))
    // CharGrams shares the indexing; its short edge counts code points too
    val cg = Seq("😀😀😀").toDF("text")
      .select(graft.functions.NGrams.charGrams(col("text"), 5).as("g"))
      .as[Seq[String]].collect()
    assert(cg(0) == Seq("😀😀😀"),
      "3 code points <= n=5 must yield the whole-string edge even though " +
        "the UTF-16 length is 6")
  }

  test("q122 cut: code-point aligned on non-BMP text") {
    // the duplicated 50-code-point run sits after an emoji prefix, so a
    // UTF-16-indexed start would shift the cut by one unit per emoji and
    // slice surrogate pairs; the cut must match a code-point brute force
    val run = ("🚀" * 10) +
      "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 50 cps, 60 UTF-16 units
    // tails start with DIFFERENT chars so no shared window extends past
    // the run (a common trailing space would be covered too)
    val d1 = "😀😀p" + run + "Xtail one"
    val d2 = "qq" + run + "Zother tail"
    val docsLocal = Seq(1L -> d1, 2L -> d2)
    val docs = docsLocal.toDF("doc_id", "text")

    // the q122 pipeline shape inline (the query itself reads from dir)
    val wins = docs.select(col("doc_id"),
      posexplode(graft.functions.NGrams.charWindowGrams(col("text"), 50))
        .as(Seq("i", "g")))
    val dup = wins.groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("g")
    val starts = wins.join(dup, "g").groupBy("doc_id")
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    val got = docs.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Dedup.removeCovered(col("text"), col("starts"), 50).as("cleaned"))
      .as[(Long, String)].collect().toMap

    // brute force over CODE POINTS
    def cps(s: String): Array[Int] = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < s.length) {
        val c = s.codePointAt(i); b += c; i += Character.charCount(c)
      }
      b.result()
    }
    val counts = new scala.collection.mutable.HashMap[String, Int]
    for ((_, t) <- docsLocal; c = cps(t); i <- 0 to c.length - 50)
      counts.update(new String(c, i, 50),
        counts.getOrElse(new String(c, i, 50), 0) + 1)
    val expected = docsLocal.map { case (id, t) =>
      val c = cps(t)
      val cov = new Array[Boolean](c.length)
      for (i <- 0 to c.length - 50; if counts(new String(c, i, 50)) >= 2;
           p <- i until i + 50) cov(p) = true
      val kept = c.indices.filter(p => !cov(p)).map(c).toArray
      id -> new String(kept, 0, kept.length)
    }.toMap

    assert(got == expected)
    assert(got(1L) == "😀😀pXtail one",
      "exactly the shared 50-cp run must leave; the emoji prefix stays intact")
  }

  test("q122: span removal equals a character-level brute force") {
    // independent reference: count every 50-char window occurrence
    // corpus-wide in plain Scala, mark covered characters with a boolean
    // array per doc, slice the kept runs
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val counts = new scala.collection.mutable.HashMap[String, Int]
    for ((_, t) <- docs; i <- 0 to t.length - 50)
      counts.update(t.substring(i, i + 50),
        counts.getOrElse(t.substring(i, i + 50), 0) + 1)
    val expected = docs.map { case (id, t) =>
      val cov = new Array[Boolean](t.length)
      for (i <- 0 to t.length - 50; if counts(t.substring(i, i + 50)) >= 2;
           p <- i until i + 50) cov(p) = true
      val cleaned = t.indices.collect { case p if !cov(p) => t(p) }.mkString
      (id, cleaned, (t.length - cleaned.length).toLong)
    }.toSet

    val got = queries("q122_substr_removal")(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(got == expected)
    assert(got.exists(_._3 > 0), "the corpus plants verbatim dups — " +
      "some span must actually be removed")
    assert(got.exists(r => r._3 > 0 && r._2.nonEmpty),
      "partial removal must keep the unique remainder")
  }

  test("q137 canonical dedup groups NFD/case/whitespace variants raw hashing misses") {
    // three renderings of the same sentence: precomposed é, decomposed
    // e+U+0301, and a case/whitespace reflow — one canonical group;
    // the fourth doc is genuinely different
    val docs = Seq(
      (1L, "Caf\u00e9 au lait"),           // NFC: precomposed e-acute
      (2L, "Cafe\u0301 au lait"),          // NFD: e + combining acute
      (3L, "  café   AU \t lait "),
      (4L, "something else entirely")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir2 = tmpDir("canon")
    docs.write.mode("overwrite").parquet(s"$dir2/documents.parquet")

    val got = queries("q137_canonical_dedup")(spark, dir2)
      .select("keep_id", "n_copies", "n_raw_variants")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 3L), (4L, 1L, 1L)))

    // raw-hash dedup sees all four texts as distinct — the canonical
    // tier's catch is real, not a restatement of q20
    assert(queries("q20_dedup_exact")(spark, dir2).count() == 4L)
  }

  test("q151 survivor policy keeps the best-quality member, not the " +
      "first-crawled one; ties fall to the lower id") {
    // b1 is a near-dup of a1 (two words appended: 28/30 shingles
    // shared, j ≈ 0.93) but strictly higher quality (longer + more
    // stopwords) — the quality policy must keep b1 where min-id keeps
    // a1. The (c1, c2) pair is byte-identical -> equal quality, tie to
    // the lower id. d9 is a singleton and must not appear.
    val base = "the quick brown fox jumps over the lazy dog while " +
      "a calm river flows past the old mill near the quiet village " +
      "in early morning light"
    val docs = Seq(
      (1L, base), (2L, base + " of course"),
      (5L, "an entirely different body of text about engines and " +
        "pipelines that shares nothing with the fox sentence at all"),
      (6L, "an entirely different body of text about engines and " +
        "pipelines that shares nothing with the fox sentence at all"),
      (9L, "a singleton document with no duplicate partner anywhere"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir2 = tmpDir("survivor")
    docs.write.mode("overwrite").parquet(s"$dir2/documents.parquet")

    val got = queries("q151_survivor_policy")(spark, dir2)
      .select("cluster_id", "n_members", "survivor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (5L, 2L, 5L)))

    // corpus-wide: one survivor per cluster, always a member, and ==
    // an in-memory argmax replica over the same cluster/quality tables
    val cl = graft.operators.Dedup.sharedNearDupClusters(spark, dir)
      .as[(Long, Long)].collect()
    val q = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScore(col("text")))
      .as[(Long, Double)].collect().toMap
    val ref = cl.groupBy(_._2).map { case (cid, ms) =>
      val members = ms.map(_._1)
      val survivor = members.minBy(id => (-q(id), id))
      (cid, members.length.toLong, survivor, q(survivor))
    }.toSet
    val full = queries("q151_survivor_policy")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    assert(full == ref)
  }

  test("q141 incremental dedup == brute-force cross-parity pairs at sf0.01") {
    val got = queries("q141_incremental_dedup")(spark, dir)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    // expected: every brute-force >=0.8 pair with one odd (new) and one
    // even (old) endpoint, oriented new->old; same-parity pairs must NOT
    // appear (old x old re-pairing is the bug this operator exists to
    // avoid)
    val expected = bruteForcePairs.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
    }
    assert(got == expected)
    assert(got.nonEmpty, "sf0.01 plants cross-parity near-dup pairs")
  }
}
