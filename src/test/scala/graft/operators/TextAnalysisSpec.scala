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

  test("q76 sketches land inside their documented error bounds") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val exactVocab = docs
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("lang").agg(countDistinct("token").as("v"))
      .as[(String, Long)].collect().toMap
    val exactLens = docs.select(col("lang"), length(col("text")).as("len"))
      .groupBy("lang").agg(collect_list("len").as("lens"))
      .as[(String, Seq[Int])].collect().toMap

    val out = graft.SparkEntry.queries("q76_approx_stats")(spark, dir)
      .select(col("lang"), col("approx_vocab"), col("n_docs"),
        array(col("approx_len_p50"), col("approx_len_p90"),
          col("approx_len_p99")).as("pcts"))
      .as[(String, Long, Long, Seq[Double])].collect()
    assert(out.length == exactVocab.size)
    for ((lang, approxV, nDocs, pcts) <- out) {
      val exact = exactVocab(lang)
      // HLL++ rsd 0.02 → 3σ = 6% relative (generous; typical error ≪)
      assert(math.abs(approxV - exact) <= math.max(1, 0.06 * exact),
        s"$lang vocab: approx $approxV vs exact $exact")
      val lens = exactLens(lang).sorted
      assert(nDocs == lens.length)
      // GK accuracy 10000 → rank error ≤ n/10000 < 1 at this n: the
      // estimate must be an EXACT order statistic neighboring the target
      for ((p, est) <- Seq(0.5, 0.9, 0.99).zip(pcts)) {
        val rank = (p * (lens.length - 1)).toInt
        val lo = lens(math.max(0, rank - 1)).toDouble
        val hi = lens(math.min(lens.length - 1, rank + 2)).toDouble
        assert(est >= lo && est <= hi,
          s"$lang p$p: $est outside [$lo,$hi]")
      }
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
}
