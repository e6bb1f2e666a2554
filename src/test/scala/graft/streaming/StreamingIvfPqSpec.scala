package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Pq

/** Streaming IVF-PQ index == batch q99's layout, at every step of a
  * replayed embeddings changelog: after each micro-batch of creates/
  * updates/deletes,
  *   (a) the maintained (cell, vec, codes) state must equal encoding the
  *       CURRENT corpus state from scratch with the frozen codebooks,
  *   (b) [[StreamingIvfPq.search]] must return exactly what the batch
  *       IVF-PQ machinery ([[Pq.adcSearchReranked]] restricted to each
  *       probe's routed cells) returns over that state — same shortlist,
  *       same exact re-rank, same rounded distances and tie order,
  * and a redelivered batch must replay idempotently. */
class StreamingIvfPqSpec extends SparkSuite {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("label", IntegerType)))
  private val sources =
    Seq(TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))

  // 4 well-separated planted cells, 32 dims (divisible by m=8)
  private val centers = {
    val rnd = new scala.util.Random(7)
    Seq.fill(4)(Array.fill(32)(rnd.nextGaussian() * 3.0))
  }
  private def vec(cell: Int, jitter: Long): Seq[Double] = {
    val r = new scala.util.Random(5000 + jitter)
    centers(cell).toSeq.map(x => x + r.nextGaussian() * 0.2)
  }

  // frozen model: codebooks trained once on a fixed pre-stream corpus
  // (the production posture — training is offline, maintenance online)
  private lazy val trainCorpus: Seq[(Long, Seq[Double], Int)] =
    (0L until 40L).map(i => (i, vec((i % 4).toInt, i), (i % 4).toInt))
  private lazy val model: Pq.Model =
    Pq.fit(trainCorpus.map { case (id, v, _) => (id, v) }
      .toDF("vec_id", "v"), m = 8, k = 4, maxIters = 3)
  // frozen routing centroids: planted-cell means of the training corpus
  private lazy val cents: Seq[(String, Seq[Double])] =
    trainCorpus.groupBy(_._3).map { case (cell, rows) =>
      (cell.toString,
        (0 until 32).map(d => rows.map(_._2(d)).sum / rows.size).toSeq)
    }.toSeq.sortBy(_._1)

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("embeddings", env, seqNo)
  }
  private def img(id: Long, v: Seq[Double], cell: Int) =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}],"label":$cell}"""
  private def create(id: Long, cell: Int, jitter: Long): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, vec(cell, jitter), cell)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: Long, oc: Int, oj: Long, nc: Int,
      nj: Long): (String, String, Long) =
    rec(s"""{"before":${img(id, vec(oc, oj), oc)},"after":${
      img(id, vec(nc, nj), nc)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: Long, cell: Int, jitter: Long): (String, String, Long) =
    rec(s"""{"before":${img(id, vec(cell, jitter), cell)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** Ground truth (a): frozen-model encode of the current state. */
  private def batchCodes(state: DataFrame): Set[(String, String, Seq[Int])] =
    Pq.encode(model, state.select(col("key").as("vec_id"),
        col("embedding").as("v")))
      .join(state.select(col("key").as("vec_id"),
        col("label").cast("string").as("cell")), "vec_id")
      .select(col("cell"), col("vec_id").cast("string"), col("codes"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Int](2)))
      .toSet

  private def stateCodes(stateDir: String): Set[(String, String, Seq[Int])] =
    StreamingIvfPq.codesState(spark, stateDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Int](2)))
      .toSet

  /** Ground truth (b): per-probe routed batch search over current state
    * with the SAME frozen model — [[Pq.adcSearchReranked]] restricted to
    * the probe's nprobe nearest cells under the frozen centroids. */
  private def expectedSearch(state: DataFrame, probeIds: Seq[Long],
      topK: Int, nprobe: Int): Set[(Long, Int, Long, Double)] = {
    val rows = state.select(col("vec_id"), col("embedding"),
        col("label").cast("string").as("cell")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getString(2)))
    probeIds.flatMap { qid =>
      val qv = rows.find(_._1 == qid).get._2
      val routedCells = cents.map { case (cell, c) =>
        (qv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cell)
      }.sortBy { case (d2, cell) => (d2, cell) }.take(nprobe)
        .map(_._2).toSet
      val cand = rows.filter(r => routedCells.contains(r._3))
      val candDf = cand.map { case (id, v, _) => (id, v) }.toSeq
        .toDF("vec_id", "v")
      val codes = Pq.encode(model, candDf)
      val probe = Seq((qid, qv)).toDF("query_id", "qv")
      Pq.adcSearchReranked(model, codes, candDf, probe, topK)
        .as[(Long, Int, Long, Double)].collect()
    }.toSet
  }

  private def gotSearch(pipeline: CdcPipeline, stateDir: String,
      probeIds: Seq[Long], topK: Int,
      nprobe: Int): Set[(Long, Int, Long, Double)] = {
    val probes = pipeline.state("embeddings")
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    StreamingIvfPq.search(spark, stateDir, model, cents, probes,
      keys => pipeline.stateRows("embeddings", keys), topK, nprobe)
      .as[(Long, Int, Long, Double)].collect().toSet
  }

  test("incremental IVF-PQ cells and search equal a frozen-model batch " +
      "build after every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sivfpq")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingIvfPq.indexView(spark, stateDir, model)))
    val probeIds = Seq(0L, 2L)

    def check(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      val state = pipeline.state("embeddings")
      assert(stateCodes(stateDir) == batchCodes(state),
        s"batch $batchId: codes state != frozen-model encode of state")
      assert(gotSearch(pipeline, stateDir, probeIds, 3, 2) ==
        expectedSearch(state, probeIds, 3, 2),
        s"batch $batchId: search != routed batch IVF-PQ")
    }

    // creates across all four cells (probes 0, 2 in different cells)
    check(0, (0L to 11L).map(i => create(i, (i % 4).toInt, i)): _*)
    // growth + an update that MOVES a vector to another cell
    check(1,
      ((12L to 17L).map(i => create(i, (i % 4).toInt, i)) :+
        update(3L, 3, 3L, 0, 303L)): _*)
    // deletes + a same-cell drift update
    check(2, delete(5L, 1, 5L), delete(12L, 0, 12L),
      update(4L, 0, 4L, 0, 404L))

    // a deleted vector is in no cell and no result
    assert(!stateCodes(stateDir).exists(_._2 == "5"))
    assert(!gotSearch(pipeline, stateDir, probeIds, 10, 4)
      .exists(_._3 == 5L))
    // the moved vector lives in its NEW cell only
    assert(stateCodes(stateDir).count(_._2 == "3") == 1)
    assert(stateCodes(stateDir).exists(c => c._2 == "3" && c._1 == "0"))
  }

  test("replayed batch is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sivfpq-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingIvfPq.indexView(spark, stateDir, model)))

    pipeline.processBatch(
      (0L to 7L).map(i => create(i, (i % 4).toInt, i))
        .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create(8L, 2, 8L), delete(1L, 1, 1L),
      update(2L, 2, 2L, 1, 102L)).toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = stateCodes(stateDir)

    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(stateCodes(stateDir) == after)
    assert(stateCodes(stateDir) == batchCodes(pipeline.state("embeddings")))
  }
}
