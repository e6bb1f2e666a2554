package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("occurrences: non-overlapping replace-count semantics") {
    val out = Seq(
      ("x the y the z", " the "),   // 2 padded occurrences
      ("the the the", " the "),     // adjacent: left-to-right consumes shared spaces
      ("nothing here", " the "))
      .toDF("text", "w")
      .select(TextAnalysis.occurrences(
        concat(lit(" "), col("text"), lit(" ")), " the ").as("n"))
      .as[Long].collect()
    assert(out(0) == 2)
    assert(out(1) == 2) // " the the the " -> first+third (middle lost its space)
    assert(out(2) == 0)
  }

  test("fingerprint is order-sensitive, equal for equal word sequences") {
    val queries = graft.SparkEntry.queries
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    df.createOrReplaceTempView("fp_docs")
    val w = split(trim(col("text")), "\\s+")
    val hw = transform(w, x =>
      pmod(conv(substring(md5(x), 1, 8), 16, 10).cast("long"),
        lit(1000000007L)))
    val fp = df.select(col("doc_id"), aggregate(
      slice(hw, lit(2), greatest(size(hw) - 1, lit(0))),
      element_at(hw, 1),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L))).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("lang-id: marker words dominate; ties resolve en-first; cjk by codepoints") {
    // run the production query over a scratch parquet dir shaped like
    // the documents table
    val docs = Seq(
      (1L, "der hund und die katze und der vogel"),
      (2L, "le chat et la maison et le chien"),
      (3L, "el gato y los perros que corren"),
      (4L, "the cat sat on a mat of straw"),
      (5L, "没有 任何 西方 词汇 在 这里"),
      (6L, "xyzzy plugh")).toDF("doc_id", "text")
      .withColumn("lang", lit("??")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("langid")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("q31_lang_id")(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "en",
      5L -> "zh", 6L -> "unknown"))
  }

  private def docsDir(prefix: String, docs: Seq[(Long, String)]): String = {
    val dir = tmpDir(prefix)
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q61 chunks: count formula, overlap reconstruction, short-doc floor") {
    // lengths: under one window (1 chunk), exactly one window (1),
    // one char past a stride boundary, and a multi-chunk doc
    val texts = Seq(
      1L -> ("a" * 48),
      2L -> (("ab" * 100)),                    // len 200 → 1 chunk
      3L -> ("x" * 201),                       // → 2 chunks
      4L -> (1 to 120).map(i => s"w$i").mkString(" ")) // multi-chunk
    val dir = docsDir("chunks", texts)
    val out = graft.SparkEntry.queries("q61_doc_chunks")(spark, dir)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._2).map(_._3).toList }
    val byId = texts.toMap
    for ((id, text) <- texts) {
      val expected = math.max(1, math.ceil((text.length - 200) / 150.0).toLong + 1)
      assert(out(id).length == expected, s"doc $id: ${out(id).length}")
      // stitching chunk 0 + the non-overlap tail of each later chunk
      // reconstructs the document exactly
      val stitched = out(id).head + out(id).tail.map(_.drop(50)).mkString
      assert(stitched == text, s"doc $id reconstruction")
      // every chunk except the last is full-width
      out(id).init.foreach(c => assert(c.length == 200))
    }
    assert(out(1L) == List(byId(1L)) && out(2L) == List(byId(2L)))
  }

  test("q62 top tokens: exact counts, count-desc token-asc tie-break, limit") {
    // 30 distinct tokens: t01..t30 where t_k appears k times, except
    // t05/t06 tied at 5 to pin the tie-break
    val words = ((1 to 30).filter(_ != 6).flatMap(k =>
      List.fill(k)(f"t$k%02d")) ++ List.fill(5)("t06"))
    val dir = docsDir("toptok", Seq(1L -> words.mkString(" ")))
    val out = graft.SparkEntry.queries("q62_top_tokens")(spark, dir)
      .as[(String, Long)].collect().toList
    assert(out.length == 25)
    assert(out.head == ("t30", 30L))
    // t07..t30 (24 tokens, counts > 5) fill the first 24 slots; the tie
    // at count 5 breaks token-ASC at the LIMIT boundary: t05 takes the
    // 25th slot, t06 deterministically falls off
    assert(out.last == ("t05", 5L))
    assert(!out.exists(t => Set("t01", "t02", "t03", "t04", "t06")(t._1)))
  }

  test("q63 seq pack: perfect fill density and deterministic assignment") {
    val out = graft.SparkEntry.queries("q63_seq_pack")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    for ((bucket, docs) <- out.groupBy(_._2)) {
      val total = docs.map(_._3).sum
      val nPacks = docs.map(_._4).distinct.length
      // contiguous-fill property: the bucket uses exactly
      // ceil(total/512) sequences — zero fragmentation
      assert(nPacks == math.ceil(total / 512.0).toLong,
        s"bucket $bucket: $nPacks packs for $total tokens")
      assert(docs.map(_._4).min == 0L)
    }
    // deterministic: a rerun assigns identical slots
    val again = graft.SparkEntry.queries("q63_seq_pack")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("q76 exact columns match an in-memory recompute and every sketch " +
      "verdict holds (the in-query bound audit agrees with this one)") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val exactVocab = docs
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("lang").agg(count(lit(1)).as("nt"),
        countDistinct("token").as("v"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exactLens = docs.select(col("lang"), length(col("text")).as("len"))
      .groupBy("lang").agg(collect_list("len").as("lens"))
      .as[(String, Seq[Int])].collect().toMap

    // independent sketch re-derivations (same sketch params the query
    // uses) — the bound audit below must agree with the query's verdicts
    val approxV = docs
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("lang").agg(approx_count_distinct(col("token"), 0.02).as("av"))
      .as[(String, Long)].collect().toMap
    val approxP = docs.select(col("lang"), length(col("text")).as("len"))
      .groupBy("lang")
      .agg(approx_percentile(col("len"), typedlit(Seq(0.5, 0.9, 0.99)),
        lit(10000)).as("pcts"))
      .as[(String, Seq[Double])].collect().toMap

    val out = graft.SparkEntry.queries("q76_approx_stats")(spark, dir)
      .as[(String, Long, Long, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(out.length == exactVocab.size)
    for ((lang, nDocs, nTok, vocab, vOk, p50Ok, p90Ok, p99Ok) <- out) {
      assert((nTok, vocab) == exactVocab(lang), s"$lang exact cols")
      val lens = exactLens(lang).sorted
      assert(nDocs == lens.length)
      // the query's verdicts must equal this spec's own bound check
      val expVOk = math.abs(approxV(lang) - vocab) <=
        math.max(1, 0.06 * vocab)
      assert(vOk == expVOk, s"$lang vocab verdict")
      val expP = Seq(0.5, 0.9, 0.99).zip(approxP(lang)).map { case (p, est) =>
        val rank = (p * (lens.length - 1)).toInt
        val lo = lens(math.max(0, rank - 1)).toDouble
        val hi = lens(math.min(lens.length - 1, rank + 2)).toDouble
        est >= lo && est <= hi
      }
      assert(Seq(p50Ok, p90Ok, p99Ok) == expP, s"$lang quantile verdicts")
      // and on this corpus the sketches genuinely land in bounds
      assert(vOk && p50Ok && p90Ok && p99Ok, s"$lang: a sketch missed")
    }
  }

  test("q103 novelty == in-memory reference; copies score zero novel") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(text: String): Set[String] = {
      val w = text.trim.split("\\s+")
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val dg = docs.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    val first: Map[String, Long] = dg
      .flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = dg.map { case (id, gs) =>
      val novel = gs.count(g => first(g) == id)
      id -> ((gs.size.toLong, novel.toLong, r6(novel.toDouble / gs.size)))
    }.toMap
    val got = graft.SparkEntry.queries("q103_ngram_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)

    // a verbatim copy of an earlier doc scores 0 novel; its source keeps
    // full credit (synthetic construction, independent of the corpus)
    val planted = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "a b c d e zz ww")).toDF("doc_id", "text")
    val pd = tmpDir("novel")
    planted.write.mode("overwrite").parquet(pd + "/documents.parquet")
    val out = graft.SparkEntry.queries("q103_ngram_novelty")(spark, pd)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == 1.0 && out(2L) == 0.0)
    assert(out(3L) == r6(2.0 / 3.0)) // shares "a b c d e" with doc 1
  }

  test("q104 vocab overlap == in-memory reference") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("source", "text").as[(String, String)].collect()
    val vocab: Map[String, Set[String]] = docs
      .groupBy(_._1)
      .map { case (src, ds) =>
        src -> ds.flatMap(_._2.trim.split("\\s+")).toSet }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val srcs = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
      inter = (vocab(a) & vocab(b)).size
    } yield (a, b) -> ((inter.toLong,
      r6(inter.toDouble / (vocab(a).size + vocab(b).size - inter))))).toMap
    val got = graft.SparkEntry.queries("q104_vocab_overlap")(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == expected)
  }

  test("q107 gopher rules == in-memory reference; each rule fires on a " +
      "planted violator") {
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def occ(hay: String, needle: String): Long =
      ((hay.length - hay.replace(needle, "").length) / needle.length).toLong
    def ref(text: String): (Long, Double, Long, Long, Long, Boolean) = {
      val w = text.trim.split("\\s+")
      val n = w.length.toLong
      val mwl = r6(text.replace(" ", "").length.toDouble / n)
      val alpha = w.count(_.exists(c =>  // ASCII letters, like the rlike
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val sym = occ(text, "#") + occ(text, "...")
      val stop = Seq(" the ", " a ", " of ").map(s => occ(s" $text ", s)).sum
      val keep = (n >= 50 && n <= 100000) && (mwl >= 3 && mwl <= 10) &&
        alpha * 1.0 >= 0.8 * n && sym * 1.0 < 0.1 * n && stop >= 2
      (n, mwl, alpha, sym, stop, keep)
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.map { case (id, t) => id -> ref(t) }.toMap
    val got = graft.SparkEntry.queries("q107_gopher_rules")(spark, dir)
      .select("doc_id", "n_tokens", "mean_word_len", "n_alpha_words",
        "n_symbols", "n_stopwords", "keep")
      .as[(Long, Long, Double, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == expected)
    // mixed outcome on the corpus: the length and stopword gates both split
    assert(got.values.exists(_._6) && got.values.exists(!_._6))

    // one planted violator per rule (the others hold): short doc; long
    // nonsense words; digit tokens; symbol spam; no stopwords
    val base = (0 until 60).map(i => s"the word$i").mkString(" ") // 120 toks
    val short = "the a of tiny"
    val longw = (0 until 60).map(_ => "the " +
      "x" * 25).mkString(" ")                      // mwl = 14 > 10
    val digits = ((0 until 50).map(_ => "12345") ++
      (0 until 10).map(i => s"the w$i")).mkString(" ")          // alpha < 0.8
    val symbols = (0 until 60).map(i => s"the #w$i#").mkString(" ") // sym ≥ 0.1n
    val nostop = (0 until 60).map(i => s"word$i only$i").mkString(" ")
    val planted = Seq((1L, base), (2L, short), (3L, longw), (4L, digits),
      (5L, symbols), (6L, nostop)).toDF("doc_id", "text")
    val pd = tmpDir("gopher")
    planted.write.mode("overwrite").parquet(pd + "/documents.parquet")
    val flags = graft.SparkEntry.queries("q107_gopher_rules")(spark, pd)
      .select("doc_id", "r_len", "r_word_len", "r_alpha", "r_symbol",
        "r_stop", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(flags(1L)._7)                      // clean doc keeps
    assert(!flags(2L)._2 && !flags(2L)._7)    // too short
    assert(!flags(3L)._3 && !flags(3L)._7)    // mean word length
    assert(!flags(4L)._4 && !flags(4L)._7)    // alphabetic fraction
    assert(!flags(5L)._5 && !flags(5L)._7)    // symbol ratio
    assert(!flags(6L)._6 && !flags(6L)._7)    // stopword floor
  }

  test("q108 zipf fit == in-memory reference; a power-law corpus " +
      "recovers its planted exponent") {
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def slopeOf(counts: Seq[Long]): Double = {
      val pts = counts.sorted(Ordering[Long].reverse) // count desc
      // tie order within equal counts does not affect ln(c) values, and
      // rank is positional — the reference sorts (count desc) only
      val top = pts.take(100).zipWithIndex
        .map { case (c, i) => (math.log(i + 1.0), math.log(c.toDouble)) }
      val n = top.size
      val mx = top.map(_._1).sum / n
      val my = top.map(_._2).sum / n
      val cov = top.map { case (x, y) => (x - mx) * (y - my) }.sum / n
      val vx = top.map { case (x, _) => (x - mx) * (x - mx) }.sum / n
      r6(cov / vx)
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("lang", "text").as[(String, String)].collect()
    val byLang = docs.groupBy(_._1).map { case (l, ds) =>
      val counts = ds.flatMap(_._2.trim.split("\\s+"))
        .groupBy(identity).map(_._2.size.toLong).toSeq
      l -> ((counts.size.toLong, math.min(counts.size, 100).toLong,
        slopeOf(counts)))
    }
    val got = graft.SparkEntry.queries("q108_zipf_fit")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == byLang)

    // synthetic corpus with freq(token r) = ceil(1000 / r): slope ≈ −1
    val planted = (1 to 200).flatMap { r =>
      val c = math.ceil(1000.0 / r).toInt
      Seq.fill(c)(s"tok$r")
    }
    val pd = tmpDir("zipf")
    Seq((1L, "xx", planted.mkString(" ")))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(pd + "/documents.parquet")
    val s = graft.SparkEntry.queries("q108_zipf_fit")(spark, pd)
      .filter(col("lang") === "xx").select("zipf_slope")
      .as[Double].head()
    assert(s < -0.9 && s > -1.1, s"planted exponent not recovered: $s")
  }

  test("q110 ccnet buckets apply the value-threshold rule to the " +
      "gate-verified q88 scores, exactly") {
    val dir = "/root/testdata/sf0.01"
    val scores = graft.SparkEntry.queries("q88_lm_perplexity")(spark, dir)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val langs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val byLang = scores.toSeq.groupBy { case (id, _) => langs(id) }
    val expected = byLang.flatMap { case (lang, ds) =>
      val n = ds.size.toLong
      // cumulative count over distinct values ascending; bucket by the
      // rank of the value's first doc — the view's exact rule
      val dist = ds.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
        .toSeq.sortBy(_._1)
      val cums = dist.scanLeft(0L)(_ + _._2).init
      val vb = dist.zip(cums).map { case ((v, _), below) =>
        v -> (if (below * 3 < n) "head"
              else if (below * 3 < 2 * n) "middle" else "tail")
      }.toMap
      ds.map { case (id, v) => id -> ((lang, v, vb(v))) }
    }
    val got = graft.SparkEntry.queries("q110_ccnet_buckets")(spark, dir)
      .as[(Long, String, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    // every language has all three buckets on this corpus
    val perLang = got.values.groupBy(_._1)
      .map { case (l, vs) => l -> vs.map(_._3).toSet }
    assert(perLang.values.forall(_ == Set("head", "middle", "tail")))
  }

  test("q112 AUC == brute-force pair counting over the q85 scores") {
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scores = graft.SparkEntry
      .queries("q85_quality_classifier")(spark, dir)
      .as[(Long, Double)].collect().toMap
    val hi = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (TextAnalysis.qualityScore(col("text")) >= 0.5).as("hi"))
      .as[(Long, Boolean)].collect().toMap
    val pos = scores.filter { case (id, _) => hi(id) }.values.toSeq
    val neg = scores.filterNot { case (id, _) => hi(id) }.values.toSeq
    // AUC = P(pos > neg) + P(pos == neg)/2, counted over ALL pairs —
    // the definition the mid-rank identity is supposed to equal
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = r6(wins / (pos.size.toDouble * neg.size))
    val got = graft.SparkEntry.queries("q112_classifier_auc")(spark, dir)
      .as[(Long, Long, Double, Double)].head()
    assert(got._1 == pos.size && got._2 == neg.size)
    assert(got._3 == expected, s"AUC ${got._3} != brute-force $expected")
    assert(got._4 == r6(2 * got._3 - 1) ||
      math.abs(got._4 - (2 * got._3 - 1)) < 2e-6) // gini = 2·auc − 1
    // the classifier actually separates its labels on this corpus
    assert(got._3 > 0.7)
  }

  test("q119 vocab coverage == in-memory reference; head docs score high") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val cnt = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    // rank (count DESC, token ASC), top 20 — the engine's window order
    val head = cnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(20).map(_._1).toSet
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = toks.map { case (id, ws) =>
      val nHead = ws.count(head)
      id -> ((ws.size.toLong, nHead.toLong, r6(nHead.toDouble / ws.size)))
    }.toMap
    val got = graft.SparkEntry.queries("q119_vocab_coverage")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    // planted: 20 head words repeated across 29 docs, one doc of 25
    // once-only rare words — the head doc scores 1.0, the rare doc 0.0
    val headWords = (0 until 20).map(i => s"h$i").mkString(" ")
    val planted = (Seq((1L, (0 until 25).map(i => s"r$i").mkString(" "))) ++
      (2L to 30L).map(i => i -> headWords)).toDF("doc_id", "text")
    val pd = tmpDir("vocabcov")
    planted.write.mode("overwrite").parquet(pd + "/documents.parquet")
    val out = graft.SparkEntry.queries("q119_vocab_coverage")(spark, pd)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == 0.0 && out(2L) == 1.0)
  }

  test("q126 Count-Min: estimates equal an independent sketch replay, " +
      "overestimate EVERY token, and detect planted collisions") {
    import graft.functions.CountMinAgg
    val dir = "/root/testdata/sf0.01"
    // independent replica of the sketch arithmetic in plain Scala
    def buckets(tok: String): Seq[Int] = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        tok.getBytes("UTF-8"))
      (0 until 4).map(r =>
        (java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16)
          % 256).toInt)
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val toks = docs.select(explode(split(trim(col("text")), "\\s+"))
      .as("token")).as[String].collect()
    val counters = Array.fill(4, 256)(0L)
    toks.foreach { t =>
      buckets(t).zipWithIndex.foreach { case (b, r) => counters(r)(b) += 1 }
    }
    def estOf(t: String): Long =
      buckets(t).zipWithIndex.map { case (b, r) => counters(r)(b) }.min
    val exact = toks.groupBy(identity).map { case (t, o) => t -> o.length.toLong }

    val got = graft.SparkEntry.queries("q126_cms_heavy_hitters")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(got.length == 20)
    got.foreach { case (tok, cnt, est) =>
      assert(cnt == exact(tok), s"$tok exact count")
      assert(est == estOf(tok), s"$tok sketch estimate != replica")
      assert(est >= cnt, s"$tok: CMS must never underestimate")
    }

    // the engine's sketch COUNTERS equal the replica's (merge across
    // partitions is element-wise add — any double count or drop shows)
    val sk = docs.select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .agg(CountMinAgg.sketch(col("token"), 4, 256).as("sk"))
      .as[Seq[Long]].head()
    assert(sk == counters.flatten.toSeq)

    // planted adversarial stream: every token forced through one bucket
    // in row 0 cannot fool the other 3 rows — est stays exact for a
    // token whose OTHER buckets are collision-free
    val all = exact.keys.toSeq
    val sameB0 = all.groupBy(t => buckets(t).head).values.maxBy(_.size)
    if (sameB0.size >= 2) {
      val t0 = sameB0.head
      // row 0's counter overcounts t0, so min over rows must beat it
      val row0 = counters(0)(buckets(t0).head)
      assert(row0 >= sameB0.map(exact).sum)
      assert(estOf(t0) <= row0)
    }
  }

  test("q129 logreg: distributed GD matches a plain-Scala replica " +
      "exactly and learns better than chance") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    def bucket(tok: String): Int =
      (java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(tok.getBytes("UTF-8")).substring(0, 8), 16) % 64).toInt
    val feats = docs.map { case (id, lang, text) =>
      val toks = text.trim.split("\\s+")
      val xs = new Array[Double](65)
      toks.foreach(t => xs(bucket(t)) += 1.0)
      (0 until 64).foreach(i => xs(i) = xs(i) * 16 / toks.length)
      xs(64) = 1.0
      (id, if (lang == "en") 1.0 else 0.0, xs)
    }
    def sig(z: Double): Double = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
    def r6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def r12(x: Double): java.math.BigDecimal = new java.math.BigDecimal(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    var w = Array.fill(65)(0.0)
    for (_ <- 1 to 6) {
      // decimal-ledger gradient: 12-rounded contributions, exact sum
      val acc = Array.fill(65)(java.math.BigDecimal.ZERO)
      feats.foreach { case (_, y, xs) =>
        val p = sig((0 until 65).foldLeft(0.0)((s, i) => s + xs(i) * w(i)))
        (0 until 65).foreach(i => acc(i) = acc(i).add(r12((p - y) * xs(i))))
      }
      w = w.indices.map(i =>
        r6(w(i) - 3.0 * (acc(i).doubleValue / feats.length))).toArray
    }
    val expected = feats.map { case (id, y, xs) =>
      val p = sig((0 until 65).foldLeft(0.0)((s, i) => s + xs(i) * w(i)))
      (id, y.toInt, r6(p))
    }.toSet
    val got = graft.SparkEntry.queries("q129_quality_logreg")(spark, dir)
      .as[(Long, Int, Double)].collect()
    assert(got.toSet == expected,
      "engine GD must equal the ledgered replica bit-for-bit")
    // the trained model must rank en above non-en better than chance
    val pos = got.filter(_._2 == 1).map(_._3)
    val neg = got.filter(_._2 == 0).map(_._3)
    val auc = pos.map(a => neg.count(b => a > b).toDouble).sum /
      (pos.length.toDouble * neg.length)
    assert(auc > 0.6, s"AUC $auc")
    assert(got.forall(r => r._3 > 0.0 && r._3 < 1.0))
  }

  test("q138 char entropy: hand-computed distributions and gate flag") {
    // H("aaaa") = 0 bits; H("abab") = 1; H("abcd") = 2 — all exact in
    // double arithmetic (powers of two throughout), so the assertion is
    // equality, not tolerance
    val pd = docsDir("entropy", Seq(
      1L -> "aaaa", 2L -> "abab", 3L -> "abcd"))
    val got = graft.SparkEntry.queries("q138_char_entropy")(spark, pd)
      .select("doc_id", "n_cp", "n_distinct", "entropy_bits", "low_entropy")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 1L, 0.0, true)))
    assert(got(2L) == ((2L, 4L, 2L, 1.0, true)))
    assert(got(3L) == ((3L, 4L, 4L, 2.0, true)))

    // the real corpus is prose-like: every doc must clear the key-mash
    // gate with room (26 letters + space at near-natural frequencies)
    val corpus = graft.SparkEntry.queries("q138_char_entropy")(
        spark, "/root/testdata/sf0.01")
      .select("entropy_bits").as[Double].collect()
    assert(corpus.length == 500)
    assert(corpus.forall(h => h > 3.5 && h < 5.0),
      s"prose entropy band violated: min=${corpus.min} max=${corpus.max}")
  }

  test("q152 calibration == in-memory recompute from the score memo; " +
      "bins partition the corpus and the top bin outranks the bottom") {
    val scores = graft.operators.TextAnalysis
      .classifierScoresBuild(spark, "/root/testdata/sf0.01")
      .select("score", "hi").as[(Double, Int)].collect()
    val ref = scores.groupBy(s => math.floor(s._1).toLong).map {
      case (b, g) =>
        (b, g.length.toLong, g.map(_._2.toLong).sum,
          BigDecimal(g.map(_._2).sum.toDouble / g.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.SparkEntry.queries("q152_calibration")(
        spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSet == ref)
    assert(got.map(_._2).sum == 500L, "bins must partition the corpus")
    assert(got.length > 2, "unit logit bins must spread")
    // the classifier was trained on these labels: reliability must
    // slope the right way end-to-end
    val byBin = got.sortBy(_._1)
    assert(byBin.last._4 > byBin.head._4,
      s"top bin ${byBin.last} must outrank bottom ${byBin.head}")
  }

  test("q148 mojibake gate: plant schedules, both damage classes, and " +
      "the exact 1% boundary in both directions") {
    // ids chosen against the plant schedules: 23/713 gain 4 U+FFFD,
    // 31/62/713 gain 2 control bytes; text lengths straddle the 1% rule
    val pd = docsDir("mojibake", Seq(
      1L -> ("c" * 50), // clean: zero damage, keeps
      23L -> ("c" * 50), // 4 repl of 55 cp: 400 < 55 false -> drop
      46L -> ("c" * 600), // 4 repl of 605 cp: 400 < 605 -> keep
      31L -> ("c" * 300), // 2 ctrl of 302: 200 < 302 -> keep
      62L -> ("c" * 50), // 2 ctrl of 52: 200 < 52 false -> drop
      713L -> ("c" * 50), // both plants (23*31): 6 damaged -> drop
      3L -> "")) // empty text: nothing to condemn -> keep
    val got = graft.SparkEntry.queries("q148_mojibake_gate")(spark, pd)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 50L, 0L, 0L, true)))
    assert(got(23L) == ((23L, 55L, 4L, 0L, false)))
    assert(got(46L) == ((46L, 605L, 4L, 0L, true)))
    assert(got(31L) == ((31L, 302L, 0L, 2L, true)))
    assert(got(62L) == ((62L, 52L, 0L, 2L, false)))
    assert(got(713L) == ((713L, 57L, 4L, 2L, false)))
    assert(got(3L) == ((3L, 0L, 0L, 0L, true)))

    // the real corpus exercises both verdicts (short docs trip on the
    // replacement plant, long ones absorb it)
    val corpus = graft.SparkEntry.queries("q148_mojibake_gate")(
        spark, "/root/testdata/sf0.01")
      .select("keep").as[Boolean].collect()
    assert(corpus.length == 500)
    assert(corpus.exists(!_) && corpus.count(identity) > 400,
      "plants must drop some docs and spare most")
  }
}
