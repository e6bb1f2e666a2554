package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Recorded-response fake: appends every (path, body) into a JVM-static
  * registry (closure serialization copies the transport into tasks, so
  * instance state would be lost — local-mode executors share the JVM and
  * the static queue sees every post). */
final class RecordingEsTransport(
    key: String,
    response: String = """{"took":1,"errors":false,"items":[]}""")
    extends EsTransport {
  override def post(path: String, body: String): String = {
    RecordingEsTransport.queue(key).add(path -> body)
    response
  }
}

object RecordingEsTransport {
  private val captured =
    scala.collection.concurrent.TrieMap
      .empty[String, ConcurrentLinkedQueue[(String, String)]]
  def queue(key: String): ConcurrentLinkedQueue[(String, String)] =
    captured.getOrElseUpdate(key, new ConcurrentLinkedQueue)
  def requests(key: String): Seq[(String, String)] =
    queue(key).asScala.toSeq
}

/** ES-7 bulk protocol golden tests: exact NDJSON emitted for upserts
  * (update + doc_as_upsert partial-doc merge — the shared-index
  * semantics) and deletes, size-bounded flushing, and item-error
  * propagation. */
class EsSinkSpec extends SparkSuite {
  import spark.implicits._

  test("upsert emits update actions with doc_as_upsert partial documents") {
    val key = "golden-upsert"
    val sink = new EsBulkUpsertSink(new RecordingEsTransport(key))
    val docs = Seq(("o1", 100L, "payed"), ("o2", 50L, "created"))
      .toDF("id", "order.amount", "order.status").coalesce(1)
    sink.upsert("order_view", docs)

    val reqs = RecordingEsTransport.requests(key)
    assert(reqs.map(_._1).distinct == Seq("/_bulk"))
    val lines = reqs.flatMap(_._2.linesIterator)
    assert(lines.size == 4) // action + payload per doc
    assert(lines.contains(
      """{"update":{"_index":"order_view","_id":"o1"}}"""))
    assert(lines.contains(
      """{"doc":{"order.amount":100,"order.status":"payed"},"doc_as_upsert":true}"""))
    assert(lines.contains(
      """{"update":{"_index":"order_view","_id":"o2"}}"""))
    assert(lines.contains(
      """{"doc":{"order.amount":50,"order.status":"created"},"doc_as_upsert":true}"""))
    // every action line immediately precedes its payload line
    lines.grouped(2).foreach { case Seq(action, payload) =>
      assert(action.startsWith("""{"update":"""), action)
      assert(payload.startsWith("""{"doc":"""), payload)
    }
  }

  test("delete emits delete actions; ids are JSON-escaped") {
    val key = "golden-delete"
    val sink = new EsBulkUpsertSink(new RecordingEsTransport(key))
    sink.delete("user_view", Seq("u1", """q"uote""").toDF("id").coalesce(1))
    val lines = RecordingEsTransport.requests(key).flatMap(_._2.linesIterator)
    assert(lines.toSet == Set(
      """{"delete":{"_index":"user_view","_id":"u1"}}""",
      """{"delete":{"_index":"user_view","_id":"q\"uote"}}"""))
  }

  test("bulks flush at the size bound — several posts, nothing dropped") {
    val key = "flush-bound"
    val sink = new EsBulkUpsertSink(new RecordingEsTransport(key),
      maxBulkBytes = 200)
    sink.upsert("idx",
      (1 to 50).map(i => (s"d$i", s"v$i")).toDF("id", "field").coalesce(1))
    val reqs = RecordingEsTransport.requests(key)
    assert(reqs.size > 1, s"expected multiple bulks, got ${reqs.size}")
    val lines = reqs.flatMap(_._2.linesIterator)
    assert(lines.count(_.startsWith("""{"update":""")) == 50)
  }

  test("a response with item errors fails the write (after retries)") {
    val key = "item-errors"
    val failing = new RecordingEsTransport(key,
      response = """{"took":1,"errors":true,"items":[{"update":{"status":429}}]}""")
    val sink = new EsBulkUpsertSink(failing, maxRetries = 2)
    val e = intercept[org.apache.spark.SparkException] {
      sink.upsert("idx", Seq(("a", 1)).toDF("id", "v").coalesce(1))
    }
    assert(e.getMessage.contains("ES bulk") ||
      Option(e.getCause).exists(_.getMessage.contains("ES bulk")))
    // retried: 2 attempts recorded
    assert(RecordingEsTransport.requests(key).size == 2)
  }

  test("the CDC pipeline materializes through the ES bulk sink end-to-end") {
    import org.apache.spark.sql.types._
    val key = "pipeline-e2e"
    val sink = new EsBulkUpsertSink(new RecordingEsTransport(key))
    val users = graft.TableSpec("users", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType))),
      primaryKey = Seq("id"))
    val session = new CdcSqlSession(spark, Seq(users))
    session.insertInto("INSERT INTO user_view SELECT id, name FROM users")
    val pipeline = session.pipeline(tmpDir("es-e2e"), sink)
    pipeline.processBatch(Seq(
      ("users", """{"before":null,"after":{"id":"u1","name":"Alice"},"op":"c","ts_ms":1}""", 1L),
      ("users", """{"before":null,"after":{"id":"u2","name":"Bo"},"op":"c","ts_ms":2}""", 2L))
      .toDF("table", "value", "seq"))

    val lines = RecordingEsTransport.requests(key).flatMap(_._2.linesIterator)
    assert(lines.contains("""{"update":{"_index":"user_view","_id":"u1"}}"""))
    assert(lines.exists(l => l.contains(""""name":"Alice"""") &&
      l.contains("doc_as_upsert")))
    assert(lines.exists(l => l.contains(""""name":"Bo"""")))
  }
}
