package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Streaming DQ counters == batch rule counts over current state after
  * every batch: violations appear on entry, decrement when an update
  * fixes the row or a delete removes it, and a rule at count 0 leaves
  * the sink. Replay is idempotent (running counters are the store a
  * double-apply would corrupt). */
class StreamingDqSpec extends SparkSuite {
  import spark.implicits._

  private val ordersSchema = StructType(Seq(
    StructField("id", StringType), StructField("amount", DoubleType),
    StructField("status", StringType)))
  private val sources =
    Seq(TableSpec("orders", ordersSchema, primaryKey = Seq("id")))

  private val rules = Seq(
    "nonpos_amount" -> (col("amount") <= 0),
    "high_amount" -> (col("amount") > 500),
    "bad_status" -> !col("status").isin("created", "payed", "closed"))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("orders", env, seqNo)
  }
  private def img(id: String, amount: Double, status: String) =
    s"""{"id":"$id","amount":$amount,"status":"$status"}"""
  private def create(id: String, a: Double, st: String = "created") =
    rec(s"""{"before":null,"after":${img(id, a, st)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, oa: Double, os: String, a: Double,
      st: String = "created") =
    rec(s"""{"before":${img(id, oa, os)},"after":${img(id, a, st)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, a: Double, st: String = "created") =
    rec(s"""{"before":${img(id, a, st)},"after":null,"op":"d","ts_ms":$seqNo}""")

  private def counters(sink: InMemoryUpsertSink): Map[String, Long] =
    sink.docs("dq_view").map { case (id, d) =>
      id -> d("n_bad").asInstanceOf[Long]
    }.toMap

  private def recompute(pipeline: CdcPipeline): Map[String, Long] =
    rules.flatMap { case (name, pred) =>
      val n = pipeline.state("orders").filter(pred).count()
      if (n > 0) Some(name -> n) else None
    }.toMap

  test("counters track violations through create/fix/delete; zero leaves sink") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdq")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      StreamingDq.ruleViews(spark, stateDir, "orders", rules))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))
      assert(counters(sink) == recompute(pipeline),
        s"batch $batchId: counters != batch recompute")
    }

    // entries: one high, one non-positive, one clean
    step(0, create("o1", 600.0), create("o2", -5.0), create("o3", 100.0))
    assert(counters(sink) == Map("high_amount" -> 1L, "nonpos_amount" -> 1L))

    // fix o1 (counter must leave at 0); o2 stays violating through an
    // update (−1 for the pre image, +1 for the post — net 0); o4 enters
    // with an unknown status
    step(1, update("o1", 600.0, "created", 400.0),
      update("o2", -5.0, "created", -7.0),
      create("o4", 50.0, "refunded"))
    assert(counters(sink) ==
      Map("nonpos_amount" -> 1L, "bad_status" -> 1L))

    // delete the violators: every counter reaches 0 and leaves
    step(2, delete("o2", -7.0), delete("o4", 50.0, "refunded"))
    assert(counters(sink).isEmpty)
  }

  test("replayed batch leaves every counter unchanged") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdq-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      StreamingDq.ruleViews(spark, stateDir, "orders", rules))

    pipeline.processBatch(Seq(create("r1", 900.0), create("r2", -1.0))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(update("r1", 900.0, "created", 100.0), create("r3", 700.0))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = counters(sink)
    assert(after == Map("high_amount" -> 1L, "nonpos_amount" -> 1L))

    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(counters(sink) == after)
    assert(counters(sink) == recompute(pipeline))
  }
}
