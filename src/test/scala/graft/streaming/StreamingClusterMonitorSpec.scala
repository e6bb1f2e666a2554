package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.KMeans

/** Streaming cluster monitor == batch q43-style recompute (same frozen
  * model) at every step of a replayed embeddings changelog — vectors
  * moving between clusters on update, a cluster draining to zero
  * retracting its row, idempotent replay of the running sums. */
class StreamingClusterMonitorSpec extends SparkSuite {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", StringType),
    StructField("embedding", ArrayType(DoubleType))))
  private val sources =
    Seq(TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))

  private val model = KMeans.Model(Seq(
    Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0)))
  private def near0(eps: Double) = Seq(9.0 + eps, 0.5, 0.0, 0.0)
  private def near1(eps: Double) = Seq(0.5, 9.0 + eps, 0.0, 0.0)

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

  private def batchRecompute(state: DataFrame): Set[(String, Long, Double)] =
    model.assign(state.select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v")))
      .groupBy(col("cluster").cast("string").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(round(sqrt(col("dist2")) * 1e6, 0)) / 1e6 /
          count(lit(1)), 6).as("mean_dist"))
      .as[(String, Long, Double)].collect().toSet

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, Long, Double)] =
    sink.docs("cluster_stats").values.map { d =>
      (d("cluster").toString, d("n_vecs").asInstanceOf[Long],
        d("mean_dist").asInstanceOf[Double])
    }.toSet

  test("incremental report equals batch recompute; cluster moves and " +
      "drain retraction") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sclmon")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingClusterMonitor.clusterStatsView(spark, stateDir, model)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("embeddings")),
        s"batch $batchId: incremental != batch recompute")
    }

    step(0, create("a1", near0(0.0)), create("a2", near0(0.3)),
      create("b1", near1(0.0)))
    val p0 = sinkRows(sink)
    assert(p0.map(r => (r._1, r._2)) == Set(("0", 2L), ("1", 1L)))

    // an update moves a vector across the centroid boundary: both
    // clusters' counts and means shift
    step(1, update("a2", near0(0.3), near1(0.2)))
    assert(sinkRows(sink).map(r => (r._1, r._2)) ==
      Set(("0", 1L), ("1", 2L)))

    // draining cluster 0 retracts its row entirely
    step(2, delete("a1", near0(0.0)))
    assert(sinkRows(sink).map(_._1) == Set("1"))
  }

  test("replayed batch is idempotent despite running double sums") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sclmon-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingClusterMonitor.clusterStatsView(spark, stateDir, model)))

    pipeline.processBatch(Seq(create("r1", near0(0.1)))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", near1(0.1)), update("r1", near0(0.1), near0(0.4)))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("embeddings")))
  }
}
