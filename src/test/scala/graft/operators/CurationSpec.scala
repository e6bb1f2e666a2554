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
}
