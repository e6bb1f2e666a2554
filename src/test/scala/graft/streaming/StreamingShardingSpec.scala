package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Relational

/** Streaming shard occupancy == batch q142-style recompute at every step
  * of a replayed document changelog — both sides run the SAME
  * rendezvousShard argmax, so the pin here is the ± counter plumbing:
  * inserts land on one shard, deletes retract from exactly that shard,
  * an emptied shard leaves the sink, replay is idempotent. */
class StreamingShardingSpec extends SparkSuite with DocCdcFixture {
  import spark.implicits._

  private def expected(
      state: Seq[(String, String)]): Map[String, (Int, Long, Long)] =
    if (state.isEmpty) Map.empty
    else state.toDF("doc_id", "text")
      .groupBy(Relational.rendezvousShard(col("doc_id"), 8).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .as[(Int, Long, Long)].collect()
      .map(r => r._1.toString -> r).toMap

  private def sinkDocs(
      sink: InMemoryUpsertSink): Map[String, (Int, Long, Long)] =
    sink.docs("shard_stats").map { case (id, d) =>
      id -> ((d("shard").asInstanceOf[Int],
        d("n_docs").asInstanceOf[Long],
        d("n_chars").asInstanceOf[Long]))
    }.toMap

  test("occupancy == batch recompute; deletes retract from the entering " +
      "shard; emptied shards leave; replay idempotent") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sshard")
    val pipeline = new CdcPipeline(spark, docSources, stateDir, sink,
      Seq(StreamingSharding.shardStatsView(spark, stateDir)))
    var state = Map.empty[String, String]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state.toSeq),
        s"batch $batchId: sink != batch recompute")
    }

    // enough docs that several shards populate
    val docs = (0 until 40).map(i => i.toString -> s"text body number $i")
    state = docs.toMap
    step(0, docs.map { case (id, t) => create(id, t) }: _*)
    assert(sinkDocs(sink).size > 2, "40 docs should spread over shards")
    assert(sinkDocs(sink).values.map(_._2).sum == 40L)

    // a text edit changes n_chars on its shard only (assignment is
    // id-pure, so the doc cannot move)
    val before = sinkDocs(sink)
    state += ("7" -> "a much longer replacement text body")
    step(1, update("7", docs(7)._2, "a much longer replacement text body"))
    val after = sinkDocs(sink)
    assert(before.keySet == after.keySet)
    assert(before.count { case (k, v) => after(k) != v } == 1)

    // deleting every doc of one shard retracts the shard row; shard
    // lookup for all ids in ONE job, not one Spark job per id
    val targetShard = sinkDocs(sink).values.head._1
    val texts = docs.toMap + ("7" -> "a much longer replacement text body")
    val shardOf: Map[String, Int] = texts.keys.toSeq.toDF("doc_id")
      .select(col("doc_id"),
        Relational.rendezvousShard(col("doc_id"), 8).as("s"))
      .as[(String, Int)].collect().toMap
    val victims = texts.keys.toSeq.filter(id => shardOf(id) == targetShard)
    assert(victims.nonEmpty)
    state = texts -- victims
    step(2, victims.map(id => delete(id, texts(id))): _*)
    assert(!sinkDocs(sink).values.exists(_._1 == targetShard))

    // replay idempotence
    val b3 = Seq(create("100", "late arrival")).toDF("table", "value", "seq")
    state += ("100" -> "late arrival")
    pipeline.processBatch(b3, Some(3L))
    val snap = sinkDocs(sink)
    pipeline.processBatch(b3, Some(3L))
    assert(sinkDocs(sink) == snap)
    assert(sinkDocs(sink) == expected(state.toSeq))
  }
}
