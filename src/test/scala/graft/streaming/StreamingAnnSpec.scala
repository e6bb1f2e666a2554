package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.functions.TopKAggregator
import graft.operators.Similarity

/** Streaming ANN index == batch q41 recompute, at every step of a
  * replayed embeddings changelog: after each micro-batch of creates/
  * updates/deletes, (a) the maintained sign-LSH bucket membership must
  * equal hashing the CURRENT vector state from scratch, and (b)
  * [[StreamingAnn.search]] against the maintained index must return
  * exactly what q41's batch plan returns over that state — same
  * candidates, same rounded scores, same tie order. */
class StreamingAnnSpec extends SparkSuite {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))
  private val sources =
    Seq(TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))
  private val planes = Similarity.hyperplanes(7)

  // 3 well-separated clusters: cluster-mates share sign patterns, so
  // buckets are non-trivial (collisions) without being degenerate
  private val centers = {
    val rnd = new scala.util.Random(42)
    Seq.fill(3)(Array.fill(64)(rnd.nextGaussian()))
  }
  private def vec(cluster: Int, jitter: Long): Seq[Double] = {
    val r = new scala.util.Random(1000 + jitter)
    centers(cluster).toSeq.map(x => x + r.nextGaussian() * 0.1)
  }

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("embeddings", env, seqNo)
  }
  private def img(id: Long, v: Seq[Double]) =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
  private def create(id: Long, v: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, v)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: Long, o: Seq[Double], n: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":${img(id, o)},"after":${img(id, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: Long, v: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":${img(id, v)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** Ground truth: bucket → member set from hashing current state. */
  private def batchBuckets(state: DataFrame): Map[String, Set[String]] =
    state.select(col("key"),
      explode(Similarity.signBands(col("embedding"), planes)).as("b"))
      .select(col("key"),
        concat_ws("|", col("b.band_id"), col("b.bh")).as("bkey"))
      .collect().map(r => (r.getString(1), r.getString(0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  private def sinkBuckets(sink: InMemoryUpsertSink): Map[String, Set[String]] =
    sink.docs("ann_index").map { case (k, d) =>
      k -> d("members_csv").toString.split(",").toSet }

  /** q41's batch plan over current state: bucket candidates → exact
    * cosine → bounded top-k, same rounding and tie order as search. */
  private def expectedSearch(
      state: DataFrame, probeIds: Seq[Long], k: Int): Set[(Long, Int, Long, Double)] = {
    val e = state.select(col("vec_id"), col("embedding").as("v"))
    val buckets = e
      .withColumn("bands", Similarity.signBands(col("v"), planes))
      .select(col("vec_id"), col("v"), explode(col("bands")).as("b"))
      .select(col("vec_id"), col("v"), col("b.band_id"), col("b.bh"))
    val q = buckets.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("band_id").as("q_band"), col("bh").as("q_bh"))
    val cands = buckets.join(q,
      col("band_id") === col("q_band") && col("bh") === col("q_bh") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"),
        col("vec_id").as("neighbor_id"), col("v")).distinct()
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(Similarity.cosine(col("qv"), col("v")), 6).as("score"))
    val topk = udaf(new TopKAggregator(k))
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .as[(Long, Int, (Double, Long))].collect()
      .map { case (qid, pos, (s, id)) => (qid, pos + 1, id, s) }.toSet
  }

  private def gotSearch(
      pipeline: CdcPipeline, stateDir: String, probeIds: Seq[Long],
      k: Int): Set[(Long, Int, Long, Double)] = {
    val probes = pipeline.state("embeddings")
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    StreamingAnn.search(spark, stateDir, probes,
      keys => pipeline.stateRows("embeddings", keys), k)
      .as[(Long, Int, Long, Double)].collect().toSet
  }

  test("incremental index and search equal batch q41 after every batch") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sann")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAnn.indexView(spark, stateDir)))
    val probeIds = Seq(0L, 1L)

    def check(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      val state = pipeline.state("embeddings")
      assert(sinkBuckets(sink) == batchBuckets(state),
        s"batch $batchId: index != batch recompute")
      assert(gotSearch(pipeline, stateDir, probeIds, 3) ==
        expectedSearch(state, probeIds, 3),
        s"batch $batchId: search != batch q41")
    }

    // creates across all clusters (probes 0,1 in different clusters)
    check(0, (0L to 9L).map(i => create(i, vec((i % 3).toInt, i))): _*)
    // growth + an update that MOVES a vector to another cluster
    check(1,
      ((10L to 15L).map(i => create(i, vec((i % 3).toInt, i))) :+
        update(2L, vec(2, 2L), vec(0, 202L))): _*)
    // deletes + a small same-cluster drift update
    check(2, delete(3L, vec(0, 3L)), delete(11L, vec(2, 11L)),
      update(0L, vec(0, 0L), vec(0, 100L)))

    // a deleted vector is in no bucket and no result
    assert(!sinkBuckets(sink).values.exists(_.contains("3")))
    assert(!gotSearch(pipeline, stateDir, probeIds, 10)
      .exists(_._3 == 3L))
  }

  test("replayed batch is idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sann-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingAnn.indexView(spark, stateDir)))

    pipeline.processBatch(
      (0L to 5L).map(i => create(i, vec((i % 3).toInt, i)))
        .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create(6L, vec(0, 6L)), delete(1L, vec(1, 1L)))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkBuckets(sink)

    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(sinkBuckets(sink) == after)
    assert(sinkBuckets(sink) == batchBuckets(pipeline.state("embeddings")))
  }
}
