package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Similarity

/** Hybrid retrieval over live indexes == an independent recompute at
  * every replayed step: the ANN buckets and the BM25 postings are
  * maintained by their own views over a two-table CDC stream
  * (documents + embeddings), and the fused read path must equal RRF —
  * computed in plain Scala, independently of [[graft.operators
  * .Retrieval.rrfFuse]] — over the two rankings recomputed from
  * current state. Edits that move a doc in ONE ranking must re-rank
  * the fusion; a deleted doc leaves both. */
class StreamingHybridSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))
  private val sources = Seq(
    TableSpec("documents", docSchema, primaryKey = Seq("doc_id")),
    TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))
  private val planes = Similarity.hyperplanes(7)

  private val centers = {
    val rnd = new scala.util.Random(42)
    Seq.fill(3)(Array.fill(64)(rnd.nextGaussian()))
  }
  private def vec(cluster: Int, jitter: Long): Seq[Double] = {
    val r = new scala.util.Random(1000 + jitter)
    centers(cluster).toSeq.map(x => x + r.nextGaussian() * 0.1)
  }

  private var seqNo = 0L
  private def rec(table: String, env: String): (String, String, Long) = {
    seqNo += 1; (table, env, seqNo)
  }
  private def docImg(id: Long, text: String) =
    s"""{"doc_id":$id,"text":"$text"}"""
  private def dCreate(id: Long, text: String) =
    rec("documents", s"""{"before":null,"after":${docImg(id, text)},"op":"c","ts_ms":$seqNo}""")
  private def dUpdate(id: Long, o: String, n: String) =
    rec("documents", s"""{"before":${docImg(id, o)},"after":${docImg(id, n)},"op":"u","ts_ms":$seqNo}""")
  private def dDelete(id: Long, text: String) =
    rec("documents", s"""{"before":${docImg(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")
  private def embImg(id: Long, v: Seq[Double]) =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
  private def eCreate(id: Long, v: Seq[Double]) =
    rec("embeddings", s"""{"before":null,"after":${embImg(id, v)},"op":"c","ts_ms":$seqNo}""")
  private def eDelete(id: Long, v: Seq[Double]) =
    rec("embeddings", s"""{"before":${embImg(id, v)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private val vocab = Seq("spark", "flink", "kafka", "delta", "arrow")
  private def text(words: (String, Int)*): String =
    words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")

  private val probeIds = Seq(1L, 2L)
  private val probeTerms: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "kafka"), 2L -> Seq("flink", "delta"))
  private val KR = 3
  private val KF = 4

  /** Dense ranking recomputed from state: q41's bucket-candidates →
    * exact cosine → (score DESC, id) rank, capped at KR. */
  private def denseRanks(state: DataFrame): Map[(Long, Long), Int] = {
    val e = state.select(col("vec_id"), col("embedding").as("v"))
    val buckets = e
      .withColumn("bands", Similarity.signBands(col("v"), planes))
      .select(col("vec_id"), col("v"), explode(col("bands")).as("b"))
      .select(col("vec_id"), col("v"), col("b.band_id"), col("b.bh"))
    val q = buckets.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("band_id").as("q_band"), col("bh").as("q_bh"))
    val scored = buckets.join(q,
      col("band_id") === col("q_band") && col("bh") === col("q_bh") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"), col("qv"), col("v"))
      .distinct()
      .select(col("query_id"), col("id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("score"))
      .as[(Long, Long, Double)].collect()
    scored.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, id, s) => (-s, id) }.take(KR).zipWithIndex
        .map { case ((_, id, _), i) => (qid, id) -> (i + 1) }
    }.toMap
  }

  /** Sparse ranking recomputed from state: q60's BM25 with each probe's
    * own terms, 12-rounded term sums, (score DESC, id) rank ≤ KR. */
  private def sparseRanks(docs: Map[Long, String]): Map[(Long, Long), Int] = {
    val toks = docs.view.mapValues(_.split("\\s+").toSeq).toMap
    val nDocs = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
    def df(term: String) = toks.values.count(_.contains(term))
    val scores = for {
      (qid, terms) <- probeTerms
      (doc, ws) <- toks if doc != qid
      s = terms.distinct.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) BigDecimal(0)
        else BigDecimal((math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
          (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * ws.size / avgdl))).toString)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      if s > 0
      r6 = BigDecimal(s.toDouble.toString)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (qid, doc, r6)
    scores.groupBy(_._1).flatMap { case (qid, rows) =>
      rows.sortBy { case (_, id, s) => (-s, id) }.take(KR).zipWithIndex
        .map { case ((_, id, _), i) => (qid, id) -> (i + 1) }
    }.toMap
  }

  /** RRF in plain Scala — independent of the production rrfFuse. */
  private def expectedFusion(dense: Map[(Long, Long), Int],
      sparse: Map[(Long, Long), Int]): Set[(Long, Long, Long, Option[Long], Option[Long], Double)] =
    (dense.keySet ++ sparse.keySet).groupBy(_._1).flatMap { case (qid, keys) =>
      val rows = keys.toSeq.map { k =>
        val d = dense.get(k); val s = sparse.get(k)
        val rrf = d.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          s.map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (k._2, d, s, rrf)
      }
      rows.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(KF).zipWithIndex
        .map { case ((id, d, s, rrf), i) =>
          (qid, (i + 1).toLong, id, d.map(_.toLong), s.map(_.toLong),
            BigDecimal(rrf.toString).setScale(9,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet

  test("fused search == independent RRF of recomputed rankings at every step") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("shybrid")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAnn.indexView(spark, stateDir),
        StreamingBm25.indexView(spark, stateDir, vocab)))

    var docs = Map.empty[Long, String]
    def got(): Set[(Long, Long, Long, Option[Long], Option[Long], Double)] = {
      val probes = pipeline.state("embeddings")
        .filter(col("vec_id").isin(probeIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      StreamingHybrid.search(spark, stateDir, probes, probeTerms,
        keys => pipeline.stateRows("embeddings", keys), KR, KF)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getDouble(5))).toSet
    }
    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))
      val expected = expectedFusion(
        denseRanks(pipeline.state("embeddings")), sparseRanks(docs))
      assert(got() == expected, s"batch $batchId")
    }

    // 8 docs: ids 1-8; embeddings cluster so probes have dense
    // neighbors; texts spread the vocab so sparse ranks differ
    val texts = Map(
      1L -> text("spark" -> 3, "kafka" -> 1),
      2L -> text("flink" -> 2, "delta" -> 2),
      3L -> text("spark" -> 2, "kafka" -> 2),
      4L -> text("flink" -> 1, "arrow" -> 3),
      5L -> text("spark" -> 1, "delta" -> 1, "arrow" -> 1),
      6L -> text("kafka" -> 4),
      7L -> text("delta" -> 3, "flink" -> 1),
      8L -> text("arrow" -> 2, "spark" -> 1))
    docs = texts
    step(0,
      (texts.toSeq.sortBy(_._1).map { case (id, t) => dCreate(id, t) } ++
        (1L to 8L).map(i => eCreate(i, vec((i % 3).toInt, i)))): _*)

    // a text edit re-ranks the sparse side only (embedding untouched)
    docs += (6L -> text("kafka" -> 1, "arrow" -> 1))
    step(1, dUpdate(6L, texts(6L), docs(6L)))

    // an embedding delete removes doc 3 from the dense side while its
    // text keeps it sparse-rankable — partial coverage, the q167 case
    step(2, eDelete(3L, vec(0, 3L)))

    // full doc departure: both rankings lose doc 7
    docs -= 7L
    step(3, dDelete(7L, texts(7L)), eDelete(7L, vec(1, 7L)))

    // replay idempotence
    pipeline.processBatch(
      Seq(dDelete(7L, texts(7L)), eDelete(7L, vec(1, 7L)))
        .toDF("table", "value", "seq"), Some(3L))
    val expected = expectedFusion(
      denseRanks(pipeline.state("embeddings")), sparseRanks(docs))
    assert(got() == expected)
  }
}
