package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.{Dedup, TextAnalysis}

/** Streaming corpus datasheet == batch q120 recompute at every step of
  * a replayed document changelog: counts, vocabulary, dup rates, the
  * decimal-ledger mean quality and language entropy must all track
  * creates, updates (including language reclassification) and deletes
  * exactly, and replay idempotently. */
class StreamingDatasheetSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType),
    StructField("lang", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String, lang: String) =
    s"""{"doc_id":"$id","text":"$text","lang":"$lang"}"""
  private def create(id: String, text: String, lang: String) =
    rec(s"""{"before":null,"after":${img(id, text, lang)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, o: (String, String), n: (String, String)) =
    rec(s"""{"before":${img(id, o._1, o._2)},"after":${img(id, n._1, n._2)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String, lang: String) =
    rec(s"""{"before":${img(id, text, lang)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Batch q120 recompute (string keys) over the materialized state. */
  private def batchRecompute(state: DataFrame)
      : (Long, Long, Long, Long, Double, Double, Double, Double) = {
    val rows = state.select(col("doc_id"), col("text"), col("lang"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = rows.as[(String, String, String)].collect()
    val n = docs.length.toLong
    val nTok = docs.map(_._2.trim.split("\\s+").length.toLong).sum
    val vocab = docs.flatMap(_._2.trim.split("\\s+")).distinct.length.toLong
    val nTexts = docs.map(_._2).distinct.length.toLong
    // near-dup endpoints with the engine's own verified pair machinery
    val exploded = rows.select(col("doc_id"),
      explode(Dedup.shingles(col("text"))).as("f"))
    val nNear = Dedup.nearDupPairs(exploded, 0.8, bandRows = 2, nBands = 32)
      .select("doc_a", "doc_b").as[(String, String)].collect()
      .flatMap(p => Seq(p._1, p._2)).distinct.length.toLong
    // mean quality through the engine's own column (collected rounded
    // values, exact decimal sum)
    val qs = rows.select(TextAnalysis.qualityScore(col("text")))
      .as[Double].collect()
    def d6(x: Double): java.math.BigDecimal = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    val meanQ = r6(qs.map(d6).reduce(_.add(_)).doubleValue / n)
    def d9(x: Double): java.math.BigDecimal = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    val ent = r6(docs.groupBy(_._3).map { case (_, xs) =>
      val p = xs.length.toDouble / n
      d9(-p * math.log(p))
    }.reduce(_.add(_)).doubleValue)
    rows.unpersist()
    (n, nTok, vocab, nTexts, r6((n - nTexts).toDouble / n),
      r6(nNear.toDouble / n), meanQ, ent)
  }

  private def sinkRow(sink: InMemoryUpsertSink)
      : Option[(Long, Long, Long, Long, Double, Double, Double, Double)] =
    sink.docs("corpus_datasheet").get("datasheet").map { d =>
      (d("n_docs").asInstanceOf[Long], d("n_tokens").asInstanceOf[Long],
        d("n_vocab").asInstanceOf[Long],
        d("n_distinct_texts").asInstanceOf[Long],
        d("exact_dup_rate").asInstanceOf[Double],
        d("neardup_doc_rate").asInstanceOf[Double],
        d("mean_quality").asInstanceOf[Double],
        d("lang_entropy").asInstanceOf[Double])
    }

  // 60-token Gopher-ish texts with stopwords (quality formula exercises
  // both terms); textA2 near-dups textA
  private def words(prefix: String, n: Int): String = {
    val w = (0 until n).map(i => s"$prefix$i")
    (Seq("the", "a", "of") ++ w).mkString(" ")
  }
  private val textA = words("aa", 57)
  private val textA2 = {
    val w = textA.split(" ")
    (w.slice(0, 30) ++ Array("swapped") ++ w.slice(31, w.length)).mkString(" ")
  }
  private val textB = words("bb", 47)
  private val textC = words("cc", 37)

  test("incremental datasheet equals batch q120 after every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdatasheet")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingDatasheet.datasheetView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      val st = pipeline.state("documents")
      if (st.isEmpty) assert(sinkRow(sink).isEmpty)
      else assert(sinkRow(sink).contains(batchRecompute(st)),
        s"batch $batchId: ${sinkRow(sink)} != ${batchRecompute(st)}")
    }

    // creates incl. an exact duplicate and a near-dup pair
    step(0, create("d1", textA, "en"), create("d2", textA, "en"),
      create("d3", textA2, "en"), create("d4", textB, "de"))
    val r0 = sinkRow(sink).get
    assert(r0._1 == 4 && r0._4 == 3) // 4 docs, 3 distinct texts
    assert(r0._6 == r6(3.0 / 4))     // d1 d2 d3 all in near-dup pairs

    // language reclassification + a text rewrite that breaks the
    // exact-dup group and shrinks the vocabulary
    step(1, update("d2", (textA, "en"), (textC, "fr")))
    assert(sinkRow(sink).get._4 == 4)

    // delete: counts, rates and entropy all shift
    step(2, delete("d4", textB, "de"))
    step(3, delete("d3", textA2, "en"))
    assert(sinkRow(sink).get._6 == 0.0) // no near-dup pairs remain

    // drain to empty: the datasheet row retracts
    step(4, delete("d1", textA, "en"), delete("d2", textC, "fr"))
    assert(sinkRow(sink).isEmpty)

    // refill after empty
    step(5, create("e1", textB, "en"))
    assert(sinkRow(sink).get._1 == 1)
  }

  test("replayed batch is idempotent across all counter tables") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdatasheet-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingDatasheet.datasheetView(spark, stateDir)))

    pipeline.processBatch(Seq(create("d1", textA, "en"),
      create("d2", textB, "de")).toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("d3", textA, "en"),
      update("d2", (textB, "de"), (textC, "fr")))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRow(sink)
    assert(after.contains(batchRecompute(pipeline.state("documents"))))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRow(sink) == after)
    assert(sinkRow(sink).contains(batchRecompute(pipeline.state("documents"))))
  }
}
