package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.Similarity

/** Streaming JL projection == batch q127 arithmetic at every step of a
  * replayed embeddings changelog: one sink doc per (vec, pos), all 16
  * retracting on delete, replay-idempotent. */
class StreamingProjectionSpec extends SparkSuite {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", StringType),
    StructField("embedding", ArrayType(DoubleType))))
  private val sources =
    Seq(TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("embeddings", env, seqNo)
  }
  private def img(id: String, v: Seq[Double]) =
    s"""{"vec_id":"$id","embedding":[${v.mkString(",")}]}"""
  private def create(id: String, v: Seq[Double]) =
    rec(s"""{"before":null,"after":${img(id, v)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, o: Seq[Double], n: Seq[Double]) =
    rec(s"""{"before":${img(id, o)},"after":${img(id, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, v: Seq[Double]) =
    rec(s"""{"before":${img(id, v)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def vec(seed: Int): Seq[Double] =
    (1 to 64).map(i => ((seed * 31 + i) % 17 - 8) / 8.0)

  private def expected(state: Seq[(String, Seq[Double])]): Map[String, Double] = {
    if (state.isEmpty) Map.empty
    else state.toDF("vec_id", "v")
      .select(col("vec_id"), explode(sequence(lit(1), lit(16))).as("pos"),
        col("v"))
      .select(concat(col("vec_id"), lit(":"), col("pos")).as("id"),
        Similarity.jlCoord(col("v"), col("pos")).as("coord"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  private def sinkCoords(sink: InMemoryUpsertSink): Map[String, Double] =
    sink.docs("jl_projection").map { case (id, d) =>
      id -> d("coord").asInstanceOf[Double]
    }.toMap

  test("projection equals batch arithmetic after every batch; deletes " +
      "retract all 16 coords; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sjl")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingProjection.jlView()))

    def step(batchId: Long, recs: (String, String, Long)*): Unit =
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))

    step(0, create("a", vec(1)), create("b", vec(2)))
    assert(sinkCoords(sink) == expected(Seq("a" -> vec(1), "b" -> vec(2))))
    assert(sinkCoords(sink).size == 32)

    step(1, update("a", vec(1), vec(3)), delete("b", vec(2)))
    val s1 = Seq("a" -> vec(3))
    assert(sinkCoords(sink) == expected(s1))
    assert(sinkCoords(sink).size == 16)

    step(1, update("a", vec(1), vec(3)), delete("b", vec(2)))
    assert(sinkCoords(sink) == expected(s1))
  }
}
