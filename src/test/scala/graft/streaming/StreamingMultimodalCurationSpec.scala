package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** Composed multimodal curation == batch q155 recompute at every step
  * of a replayed document changelog: the sink must hold exactly the
  * docs that pass the quality floor AND win their TEXT near-dup cluster
  * (argmax quality) AND win their MEDIA near-dup cluster (max pixels,
  * radius-5/8-band geometry) of the CURRENT state — including the
  * production subtlety the composition introduces: when the two
  * policies pick DIFFERENT members of a duplicated document, every
  * copy is a loser on one side and the whole cluster leaves the
  * corpus. */
class StreamingMultimodalCurationSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  // Word LENGTHS vary per text, not just the letters: the block-mean
  // hash compares each block's byte mean against the global mean, so
  // texts that differ by a uniform letter shift (a0→b0→c0) hash
  // IDENTICALLY — distinct corpora here need distinct length patterns
  // (verified pairwise Hamming: A↔B 15, A↔C 12, B↔C 23 — all > 5).
  private def qwords(prefix: String, lens: Seq[Int]): Seq[String] = {
    val w = (0 until 37).map(i => prefix * lens(i % lens.length) + i)
    ("the" +: w.slice(0, 12)) ++ ("a" +: w.slice(12, 24)) ++
      ("of" +: w.slice(24, 37))
  }
  private val textA = qwords("a", Seq(1)).mkString(" ")
  private val textB = qwords("b", Seq(1, 5, 2, 7, 3, 1, 6)).mkString(" ")
  private val textC = qwords("c", Seq(4, 1, 8, 2, 6, 3, 1)).mkString(" ")

  /** Batch q155 recompute over the current materialized document state
    * — the same operators the gate row composes, applied to the state
    * frame. */
  private def batchQ155(state: DataFrame): Map[String, (String, Double)] = {
    val docs = state.select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // text losers: argmax (quality, −id) per shingle-LSH cluster
    val exploded = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"))).as("f"))
    val pairs = Dedup.nearDupPairs(exploded, 0.8, bandRows = 2, nBands = 32)
      .select("doc_a", "doc_b")
    val clusters = Dedup.clusterPairsStar(pairs)
    val q = docs.select(col("doc_id").as("m_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val surv = clusters.join(q, clusters("doc_id") === q("m_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("quality").as("q"),
        (-col("m_id").cast("long")).as("negid"))).as("m"))
      .select(col("cluster_id"), (-col("m.negid")).cast("string").as("sid"))
    val textLosers = clusters.join(surv, "cluster_id")
      .filter(col("doc_id") =!= col("sid")).select("doc_id")
    // media losers: max-pixels survivor per radius-5 phash cluster
    val docsL = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"))
    val media = Multimodal.mediaFrameOf(docsL)
    val mPairs = Multimodal.phashPairsOf(media, maxHamming = 5, nBands = 8)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val mClusters = Dedup.clusterPairsStar(mPairs)
      .select(col("doc_id").as("media_id"), col("cluster_id"))
    val mSurv = mClusters.join(Multimodal.pixelFrameOf(media), "media_id")
      .groupBy("cluster_id")
      .agg(max(struct(col("px"), (-col("media_id")).as("negid"))).as("m"))
      .select(col("cluster_id"), (-col("m.negid")).as("sid"))
    val mediaLosers = mClusters.join(mSurv, "cluster_id")
      .filter(col("media_id") =!= col("sid"))
      .select(col("media_id").cast("string").as("doc_id"))
    val bucket = pmod(
      conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
      lit(100L))
    val out = docs
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
      .join(textLosers, Seq("doc_id"), "left_anti")
      .join(mediaLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .as[(String, String, Double)].collect()
      .map { case (id, s, qq) => id -> (s, math.rint(qq * 1e6) / 1e6) }.toMap
    docs.unpersist()
    out
  }

  private def sinkDocs(sink: InMemoryUpsertSink): Map[String, (String, Double)] =
    sink.docs("multimodal_corpus").map { case (id, d) =>
      id -> (d("split").toString,
        math.rint(d("quality").asInstanceOf[Double] * 1e6) / 1e6)
    }.toMap

  test("composed view == batch q155 after every batch; disagreeing " +
      "policies drop a whole duplicate cluster; replay is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("smmcuration")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingMultimodalCuration.multimodalCuratedView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == batchQ155(pipeline.state("documents")),
        s"batch $batchId: incremental != batch q155 recompute")
    }

    // ids picked for their pixel formulas: 33 → png 544×544, 34 → jpeg
    // 560×560 (more pixels, HIGHER id), 35 → wav (0 px), 36 → png
    // 592×592 (most pixels), 40 → jpeg. Identical text ⇒ identical
    // data section ⇒ Hamming-0 media pair, so the media clusters below
    // are certain, not probabilistic.
    //
    // 33 and 34 share text: the TEXT policy keeps 33 (equal quality,
    // min id) but the MEDIA policy keeps 34 (max pixels) — every copy
    // loses somewhere, the whole cluster leaves the corpus
    step(0, create("33", textA), create("34", textA), create("40", textB))
    assert(sinkDocs(sink).keySet == Set("40"),
      "disagreeing survivor policies must drop the whole cluster")

    // rewriting 34 dissolves both clusters → both re-admitted
    step(1, update("34", textA, textC))
    assert(sinkDocs(sink).keySet == Set("33", "34", "40"))

    // delete 33 — no cluster change for the others
    step(2, delete("33", textA))
    assert(sinkDocs(sink).keySet == Set("34", "40"))

    // 35 duplicates 34's text but renders as AUDIO (0 px): both
    // policies agree on 34 — the agreeing case keeps the survivor
    step(3, create("35", textC))
    assert(sinkDocs(sink).keySet == Set("34", "40"))

    // 36 joins with the MOST pixels but the HIGHEST id: media keeps 36,
    // text keeps 34 — disagreement again, the whole trio leaves
    step(4, create("36", textC))
    assert(sinkDocs(sink).keySet == Set("40"))

    // replay the last batch verbatim (crash-redelivery): same sink
    val before = sinkDocs(sink)
    step(4, create("36", textC))
    assert(sinkDocs(sink) == before, "replayed batch must be idempotent")

    // a quality edit on 36 makes it the TEXT survivor too — policies
    // re-align on 36 (it already wins on pixels); 34/35 stay losers
    val textHQ = {
      val w = qwords("c", Seq(4, 1, 8, 2, 6, 3, 1)).toArray
      w(20) = "the"; w.mkString(" ")
    }
    step(5, update("36", textC, textHQ))
    assert(sinkDocs(sink).keySet == Set("36", "40"),
      "re-aligned policies must re-admit the double winner")
  }
}
