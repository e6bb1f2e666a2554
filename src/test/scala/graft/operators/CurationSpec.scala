package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The composed curation pipeline (q39) beyond the gate's hash-match:
  * the survivor property — no near-dup loser ever reaches the output,
  * every cluster is represented by AT MOST its minimum doc — and the
  * quality/split invariants. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val queries = graft.SparkEntry.queries

  test("curated corpus drops exactly the non-minimum cluster members") {
    val curated = queries("q39_curated_corpus")(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clusters = queries("q36_dedup_clusters")(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
    assert(!losers.isEmpty, "sf0.01 plants near-dup clusters")
    assert(curated.join(losers, Seq("doc_id"), "left_semi").isEmpty,
      "no cluster loser may survive curation")

    // each cluster's minimum survives iff it passes the quality filter —
    // dedup must never drop a whole cluster the quality filter kept
    val minima = clusters.filter(col("doc_id") === col("cluster_id"))
    val qualifiedMinima = minima.join(
      graft.sources.Tables.load(spark, dir, "documents")
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val missing = qualifiedMinima
      .join(curated, Seq("doc_id"), "left_anti")
    assert(missing.isEmpty, "every quality-passing cluster minimum survives")

    val qs = curated.select("quality").as[Double].collect()
    assert(qs.nonEmpty && qs.forall(_ >= 0.5))
    val splits = curated.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    curated.unpersist(); clusters.unpersist()
  }

  test("exportCorpus: hive layout, bounded sorted files, lossless round-trip") {
    val out = tmpDir("export")
    val audit = Curation.exportCorpus(spark, dir, out, maxRecordsPerFile = 50)

    // hive-partitioned directories, nothing else at the top level
    val top = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    assert(top.nonEmpty && top.forall(_.matches("split=(train|val|test)")))
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("split=")).flatMap(_.listFiles())
      .filter(_.isDirectory)
    assert(langDirs.nonEmpty && langDirs.forall(_.getName.matches("lang=\\w+")))

    // every data file respects maxRecordsPerFile and is doc_id-sorted
    for (f <- langDirs.flatMap(_.listFiles())
        if f.getName.endsWith(".parquet")) {
      val ids = spark.read.parquet(f.getPath)
        .select("doc_id").as[Long].collect()
      assert(ids.length <= 50, s"${f.getName}: ${ids.length} rows")
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
    }

    // round trip: partition columns come back, content matches q39 ∪ docs
    val back = spark.read.parquet(out)
    val expected = queries("q39_curated_corpus")(spark, dir)
      .join(graft.sources.Tables.load(spark, dir, "documents")
        .select("doc_id", "text", "lang"), "doc_id")
    assert(back.count() == expected.count())
    // the write-pass Observation audited exactly what landed on disk
    assert(audit.nRows == back.count())
    assert(audit.nEmptyText == 0L)
    assert(audit.minQuality.exists(_ >= 0.5))
    assert(audit.minQuality.contains(
      back.agg(min("quality")).as[Double].head()))
    assert(back.select("doc_id", "text", "lang", "split", "quality")
      .exceptAll(expected.select("doc_id", "text", "lang", "split", "quality"))
      .isEmpty)
    // partition pruning serves a split/lang slice from its directory only
    val pruned = back.filter(col("split") === "train" && col("lang") === "en")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }).sum
    assert(scanned == 1, s"expected 1 pruned partition, scanned $scanned")
  }

  test("q102 DSIR == independent in-memory reference; target docs rank high") {
    // full third-engine recompute (neither Spark nor DuckDB): hashed
    // word-bigram counts, add-one-smoothed log-ratios rounded to 6,
    // exact BigDecimal accumulation — must match the engine EXACTLY
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    val docCnt: Map[(Long, Long), Long] = docs.flatMap { case (id, _, text) =>
      val w = text.trim.split("\\s+")
      w.iterator.zip(w.iterator.drop(1))
        .map { case (a, b) => (id, bucket(a + " " + b)) }.toSeq
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val isTarget = docs.map(d => d._1 -> (d._2 == "en")).toMap
    val rf = docCnt.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val tf = docCnt.filter(kv => isTarget(kv._1._1))
      .groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val (rn, tn) = (rf.values.sum, tf.values.sum)
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lam: Map[Long, BigDecimal] = rf.map { case (b, rc) =>
      b -> r6(math.log((tf.getOrElse(b, 0L) + 1.0) / (tn + 1024.0)) -
        math.log((rc + 1.0) / (rn + 1024.0)))
    }
    val expected: Map[Long, Double] = docCnt.toSeq
      .map { case ((id, b), c) => id -> (lam(b) * c) }
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum.toDouble }

    val got = queries("q102_dsir_importance")(spark, dir)
      .as[(Long, Double)].collect().toMap
    assert(got == expected)

    // sanity of the SIGNAL: English (target-domain) docs must average a
    // higher importance weight than the rest of the pool
    val (t, o) = got.partition(kv => isTarget(kv._1))
    assert(t.values.sum / t.size > o.values.sum / o.size)
  }

  test("q109 domain cap == in-memory reference (top 10 per source by " +
      "quality, deterministic ties)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def occ(hay: String, needle: String): Long =
      ((hay.length - hay.replace(needle, "").length) / needle.length).toLong
    def quality(text: String): Double = {
      val n = text.trim.split("\\s+").length.toLong
      val stop = Seq(" the ", " a ", " of ").map(s => occ(s" $text ", s)).sum
      r6(math.min(1.0, n / 100.0) * 0.5 + math.min(1.0, stop * 10.0 / n) * 0.5)
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("source", "doc_id", "text").as[(String, Long, String)]
      .collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(d => (d._2, quality(d._3)))
        .sortBy { case (id, q) => (-q, id) }
        .take(10).zipWithIndex
        .map { case ((id, q), i) => (src, id, q, (i + 1).toLong) }
    }.toSet
    val got = graft.SparkEntry.queries("q109_domain_cap")(spark, dir)
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == expected)
    // exactly 10 per source on this corpus (every source has ≥ 10 docs)
    assert(got.groupBy(_._1).values.forall(_.size == 10))
  }

  test("q111 DoReMi weights == in-memory reference from per-source " +
      "losses; excess-loss sources gain weight, sum stays 1") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r6(x: Double): JBD = new JBD(x).setScale(6, RoundingMode.HALF_UP)
    val got = graft.SparkEntry.queries("q111_doremi_weights")(spark, dir)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    // independent replica of the update rule from the REPORTED losses
    val loss = got.map(r => r._3)
    val n = got.length
    var w: IndexedSeq[JBD] = IndexedSeq.fill(n)(r6(1.0 / n))
    for (_ <- 1 to 5) {
      val m = got.indices.map(i => w(i).multiply(r6(loss(i))))
        .reduce(_.add(_)).doubleValue
      val ew = got.indices.map(i =>
        r6(w(i).doubleValue * math.exp(0.1 * (loss(i) - m))))
      val z = ew.reduce(_.add(_)).doubleValue
      w = ew.map(e => r6(e.doubleValue / z))
    }
    assert(got.indices.forall(i => got(i)._4 == w(i).doubleValue))
    // weights renormalize each round (rounding leaves ≤ n·5e-7 slack)
    assert(math.abs(got.map(_._4).sum - 1.0) < n * 5e-7)
    // monotone in loss: the hardest source outweighs the easiest
    val byLoss = got.sortBy(_._3)
    assert(byLoss.last._4 > byLoss.head._4)
    // and weights actually moved off uniform
    assert(got.exists(r => math.abs(r._4 - 1.0 / n) > 1e-4))
  }

  test("q120 datasheet: counts from independent driver-side aggregation, " +
      "rates consistent with the standalone dedup queries") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    val row = graft.SparkEntry.queries("q120_corpus_datasheet")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // counts re-derived in plain Scala
    assert(row._1 == docs.length)
    assert(row._2 == docs.map(_._2.trim.split("\\s+").length.toLong).sum)
    assert(row._3 == docs.flatMap(_._2.trim.split("\\s+")).distinct.length)
    val distinctTexts = docs.map(_._2).distinct.length
    assert(row._4 == distinctTexts)
    assert(row._5 == r6((docs.length - distinctTexts).toDouble / docs.length))
    // near-dup doc rate consistent with q21's verified pair set
    val pairDocs = graft.SparkEntry.queries("q21_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(row._6 == r6(pairDocs.toDouble / docs.length))
    // mean quality: re-derive the full scoring formula driver-side and
    // run it through the same decimal ledger (6-rounded scores summed
    // exactly, one double division)
    def qualityOf(text: String): Double = {
      val pad = " " + text + " "
      val nTok = text.trim.split("\\s+").length
      val stopCnt = Seq(" the ", " a ", " of ").map { nd =>
        (pad.length - pad.replace(nd, "").length) / nd.length
      }.sum
      r6(math.min(1.0, nTok / 100.0) * 0.5 +
        math.min(1.0, stopCnt * 10.0 / nTok) * 0.5)
    }
    def d6(x: Double): java.math.BigDecimal = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    val qSum = docs.map(d => d6(qualityOf(d._2))).reduce(_.add(_))
    assert(row._7 == r6(qSum.doubleValue / docs.length),
      s"mean_quality ${row._7} != driver-side ledger recompute")

    // entropy: recompute from the lang histogram with the same ledger
    val byLang = docs.groupBy(_._3).map { case (_, xs) => xs.length }
    def r9(x: Double): java.math.BigDecimal = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    val ent = byLang.map { c =>
      val p = c.toDouble / docs.length
      r9(-p * math.log(p))
    }.reduce(_.add(_)).doubleValue
    assert(row._8 == r6(ent))
    assert(row._8 > 0.0, "multi-language corpus must have positive entropy")
  }

  test("q121 funnel: monotone attrition, endpoints match the corpus " +
      "and the composed build's output") {
    val dir = "/root/testdata/sf0.01"
    val f = graft.SparkEntry.queries("q121_pipeline_funnel")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val chain = Seq(f._1, f._2, f._3, f._4, f._5, f._6, f._7)
    assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
      s"funnel must be non-increasing: $chain")
    // endpoints: total == corpus size; final == q115's emitted rows
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(f._1 == nDocs)
    val q115 = graft.SparkEntry
      .queries("q115_pipeline_corpus")(spark, dir).count()
    assert(f._7 == q115, s"funnel tail ${f._7} != q115 output $q115")
    // every stage actually drops something on this corpus
    assert(f._2 < f._1 && f._3 < f._2 && f._7 <= f._6)
  }

  test("q123 packing: hierarchical prefix sum equals a single in-memory " +
      "cumulative sum; boundary-crossing docs span multiple sequences") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .sortBy(_._1)
    var off = 0L
    val expected = docs.map { case (id, text) =>
      val n = text.trim.split("\\s+").length.toLong
      val first = off / 512
      val last = if (n > 0) (off + n - 1) / 512 else first
      val row = (id, n, off, first, last, last - first + 1)
      off += n
      row
    }.toSet
    val got = queries("q123_sequence_packing")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.exists(_._6 > 1),
      "some doc must cross a 512-token cut on this corpus")
    assert(got.map(_._6).forall(_ >= 1))
  }

  test("q128 C4 filters: matches an in-memory replica; every rule " +
      "fires both ways on this corpus") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.map { case (id, text) =>
      val words = text.trim.split("\\s+")
      val nl = (words.length + 9) / 10
      val lines = (0 until nl).map { l =>
        val base = words.slice(l * 10, l * 10 + 10).mkString(" ")
        base +
          (if ((id + l) % 11 == 0) " javascript" else "") +
          (if (id % 13 == 0 && l == 0) " lorem ipsum" else "") +
          (if (id % 17 == 0 && l == 1) " {" else "") +
          (if ((id + l) % 3 != 0) "." else "")
      }
      val kept = lines.filter(ln => ln.endsWith(".") &&
        ln.split("\\s+").length >= 5 && !ln.contains("javascript"))
      val pageKeep = kept.length >= 3 &&
        !lines.exists(_.contains("lorem ipsum")) &&
        !lines.exists(_.contains("{"))
      (id, nl.toLong, kept.length.toLong, pageKeep, kept.mkString("\n"))
    }.toSet
    val got = queries("q128_c4_filters")(spark, dir)
      .as[(Long, Long, Long, Boolean, String)].collect().toSet
    assert(got == expected)

    // every rule must fire at least once AND pass at least once
    val byId = expected.map(r => r._1 -> r).toMap
    assert(expected.exists(_._4) && expected.exists(!_._4))
    val short = docs.filter { case (id, text) =>
      val nw = text.trim.split("\\s+").length
      nw % 10 != 0 && nw % 10 < 5 // last line short -> word-count drop
    }
    assert(short.nonEmpty, "corpus should exercise the >=5-words rule")
    assert(expected.exists(r => byId(r._1)._2 - r._3 > 0),
      "some line must be dropped")
    assert(expected.exists(r => r._1 % 13 == 0 && !r._4),
      "lorem-ipsum pages must drop")
    assert(expected.exists(r => r._1 % 17 == 0 && !r._4),
      "curly-brace pages must drop")
  }

  test("q139 blocklist: whole-word matching and the exact density boundary") {
    val docs = Seq(
      // substrings of blocked terms must NOT match — tokenized, not LIKE
      (1L, "hashing rehash hashes vectorize slowly"),
      // 5 blocked of 10 tokens -> drop; matched terms distinct + sorted
      (2L, "slow hash vector slow slow x y z q w"),
      // exactly 10% density: 10*1 < 10 is false -> drop (boundary)
      (3L, "a b c d e f g h i slow"),
      // just under 10%: 10*1 < 11 -> keep, with the term still reported
      (4L, "a b c d e f g h i j slow"),
      // blank text: the phantom [""] token is filtered -> n_tokens=0,
      // and the gate passes (no blocked content = no grounds to drop)
      (5L, "   \t ")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir2 = tmpDir("blocklist")
    docs.write.mode("overwrite").parquet(s"$dir2/documents.parquet")

    val got = graft.SparkEntry.queries("q139_blocklist_gate")(spark, dir2)
      .select("doc_id", "n_tokens", "n_blocked", "matched_terms", "keep")
      .as[(Long, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 0L, "", true)))
    assert(got(2L) == ((2L, 10L, 5L, "hash,slow,vector", false)))
    assert(got(3L) == ((3L, 10L, 1L, "slow", false)))
    assert(got(4L) == ((4L, 11L, 1L, "slow", true)))
    assert(got(5L) == ((5L, 0L, 0L, "", true)))
  }

  test("q165: no near-dup cluster straddles splits; singletons reduce " +
      "to exactly q34") {
    val r = queries("q165_leak_safe_split")(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assert(!r.filter(col("grouped")).isEmpty,
        "sf0.01 plants near-dup clusters — the guard must fire")
      // the leakage guard: every cluster lands in ONE split
      val straddling = r.filter(col("grouped")).groupBy("split_key")
        .agg(countDistinct("split").as("k")).filter(col("k") > 1)
      assert(straddling.isEmpty, "a cluster straddles train/val/test")
      // off the duplicate graph the operator IS q34 — same bucket, same
      // split for every singleton
      val q34 = queries("q34_train_split")(spark, dir)
        .select(col("doc_id"), col("bucket").as("b34"),
          col("split").as("s34"))
      val diverged = r.filter(!col("grouped")).join(q34, "doc_id")
        .filter(col("split") =!= col("s34") || col("bucket") =!= col("b34"))
      assert(diverged.isEmpty, "singleton split diverged from q34")
    } finally r.unpersist()
  }
}
