package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.KMeans

/** Incremental SemDeDup == batch q101 recompute (same frozen model, same
  * keep-lowest-key order) at every step of a replayed embeddings
  * changelog — including survivor hand-off when the KEPT vector of a
  * duplicate group is deleted, and a vector moving between clusters. */
class StreamingSemDeDupSpec extends SparkSuite {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", StringType),
    StructField("embedding", ArrayType(DoubleType))))
  private val sources =
    Seq(TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))

  // frozen 2-cluster model in 4 dims: axis-aligned, well separated
  private val model = KMeans.Model(Seq(
    Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0)))
  // near-duplicates of a base direction within cluster 0 (cos ≈ 1),
  // an orthogonal-ish singleton in cluster 0, and cluster-1 vectors
  private def dup0(eps: Double) = Seq(9.0, 0.1 + eps, 0.2, 0.3)
  // closer to centroid 0 (d² = 177 vs 237) yet cos ≈ 0.26 < τ vs dup0
  private val lone0 = Seq(3.0, 0.0, -8.0, 8.0)
  private def dup1(eps: Double) = Seq(0.1, 9.0, 0.2 + eps, 0.1)

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("embeddings", env, seqNo)
  }
  private def img(id: String, v: Seq[Double]) =
    s"""{"vec_id":"$id","embedding":[${v.mkString(",")}]}"""
  private def create(id: String, v: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, v)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, o: Seq[Double], n: Seq[Double]) =
    rec(s"""{"before":${img(id, o)},"after":${img(id, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, v: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":${img(id, v)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** Batch q101 over current state with the same frozen model; string
    * vec ids, so the keep order is the key order on both sides. */
  private def batchRecompute(state: DataFrame): Set[(String, Int, Long, Double)] = {
    KMeans.semDedup(state.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v")), model, 0.45)
      .as[(String, Int, Long, Double)].collect().toSet
  }

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, Int, Long, Double)] =
    sink.docs("semdedup_view").values.map { d =>
      (d("vec_id").toString, d("cluster").toString.toInt,
        d("n_dups").asInstanceOf[Long], d("max_cos").asInstanceOf[Double])
    }.toSet

  test("incremental removals equal batch q101 recompute after every " +
      "batch, including survivor hand-off and cluster moves") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssemdedup")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSemDeDup.semDedupView(spark, stateDir, model)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("embeddings")),
        s"batch $batchId: incremental != batch recompute")
    }

    // three near-dups in cluster 0 + unrelated residents: the two
    // larger keys are removed, the smallest key survives
    step(0, create("a1", dup0(0.00)), create("a2", dup0(0.01)),
      create("a3", dup0(0.02)), create("x1", lone0),
      create("b1", dup1(0.00)))
    val p0 = sinkRows(sink)
    assert(p0.map(_._1) == Set("a2", "a3"))
    // n_dups counts SMALLER-key partners: a2 sees {a1}, a3 sees {a1, a2}
    assert(p0.map(r => (r._1, r._2, r._3)) ==
      Set(("a2", 0, 1L), ("a3", 0, 2L)))

    // deleting the SURVIVOR hands survivorship to a2: a3 stays removed
    // (now 1 dup), a2's row retracts — an untouched-resident transition
    step(1, delete("a1", dup0(0.00)))
    val p1 = sinkRows(sink)
    assert(p1.map(_._1) == Set("a3"))
    assert(p1.head._3 == 1)

    // a duplicate appears in cluster 1 via UPDATE of the lone cluster-0
    // vector moving clusters: both clusters re-score
    step(2, update("x1", lone0, dup1(0.005)))
    val p2 = sinkRows(sink)
    assert(p2.map(_._1) == Set("a3", "x1")) // x1 > b1 in key order
    assert(p2.find(_._1 == "x1").exists(_._2 == 1))

    // threshold boundary: an update pulling a3 away from a2 far enough
    // drops the pair below τ and clears cluster 0 entirely
    step(3, update("a3", dup0(0.02), lone0))
    assert(sinkRows(sink).map(_._1) == Set("x1"))
  }

  test("replayed batch is idempotent (postings merge skips, sink converges)") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssemdedup-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSemDeDup.semDedupView(spark, stateDir, model)))

    pipeline.processBatch(Seq(create("r1", dup0(0.0)))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", dup0(0.01)), create("r3", lone0))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after.map(_._1) == Set("r2"))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("embeddings")))
  }
}
