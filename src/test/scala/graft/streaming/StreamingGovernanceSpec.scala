package graft.streaming

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** The governance streaming twins (r12 VERDICT #5) == their batch
  * queries' arithmetic over the current state at every replayed step:
  * q162 k-anonymity class sizes maintained ± with the at-risk flag
  * flipping as classes shrink/grow and an emptied class leaving the
  * sink; q163 snapshot diff counts maintained ± as either corpus
  * version changes, including a doc flipping change-class and a
  * change-class emptying. Both replay-idempotent. */
class StreamingGovernanceSpec extends SparkSuite {
  import spark.implicits._

  private var seqNo = 0L
  private def rec(table: String, env: String): (String, String, Long) = {
    seqNo += 1; (table, env, seqNo)
  }

  // ——— k-anonymity ———

  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_nationkey", LongType),
    StructField("c_mktsegment", StringType)))

  private def cimg(id: Long, nat: Long, mkt: String) =
    s"""{"c_custkey":$id,"c_nationkey":$nat,"c_mktsegment":"$mkt"}"""
  private def cCreate(id: Long, nat: Long, mkt: String) =
    rec("customer", s"""{"before":null,"after":${cimg(id, nat, mkt)},"op":"c","ts_ms":$seqNo}""")
  private def cMove(id: Long, nat: Long, o: String, n: String) =
    rec("customer", s"""{"before":${cimg(id, nat, o)},"after":${cimg(id, nat, n)},"op":"u","ts_ms":$seqNo}""")
  private def cDelete(id: Long, nat: Long, mkt: String) =
    rec("customer", s"""{"before":${cimg(id, nat, mkt)},"after":null,"op":"d","ts_ms":$seqNo}""")

  test("incremental k-anonymity == batch class sizes, at-risk priced at read") {
    val k = 2
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("skanon")
    val pipeline = new CdcPipeline(spark,
      Seq(TableSpec("customer", custSchema, primaryKey = Seq("c_custkey"))),
      stateDir, sink,
      Seq(StreamingKAnonymity.view(spark, stateDir, k = k)))

    var state = Map.empty[Long, (Long, String)] // id -> (nation, mkt)
    def expected: Map[String, (Long, Boolean)] =
      state.values.groupBy(identity).map { case ((nat, mkt), rows) =>
        s"$nat|$mkt" -> (rows.size.toLong, rows.size < k)
      }
    def read: Map[String, (Long, Boolean)] =
      sink.docs("k_anonymity").map { case (id, d) =>
        id -> (d("class_size").asInstanceOf[Long],
          d("at_risk").asInstanceOf[Boolean])
      }
    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))
      assert(read == expected, s"batch $batchId")
    }

    // two classes: (1, AUTO) size 2 (safe at k=2), (1, BIKE) size 1 (at risk)
    state = Map(1L -> (1L, "AUTO"), 2L -> (1L, "AUTO"), 3L -> (1L, "BIKE"))
    step(0, cCreate(1, 1, "AUTO"), cCreate(2, 1, "AUTO"),
      cCreate(3, 1, "BIKE"))
    assert(read("1|AUTO") == ((2L, false)) && read("1|BIKE") == ((1L, true)))

    // a segment move shrinks AUTO below k (flag flips) and grows BIKE to
    // safety — at-risk re-prices on the same batch
    state += (2L -> (1L, "BIKE"))
    step(1, cMove(2, 1, "AUTO", "BIKE"))
    assert(read("1|AUTO") == ((1L, true)) && read("1|BIKE") == ((2L, false)))

    // deleting the last AUTO row empties the class — it must LEAVE the
    // sink, not linger at size 0
    state -= 1L
    step(2, cDelete(1, 1, "AUTO"))
    assert(!read.contains("1|AUTO"))

    // replay idempotence: redelivering batch 2 changes nothing
    pipeline.processBatch(
      Seq(cDelete(1, 1, "AUTO")).toDF("table", "value", "seq"), Some(2L))
    assert(read == expected)
  }

  // ——— snapshot diff ———

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  private def dimg(id: Long, src: String, text: String) =
    s"""{"doc_id":$id,"source":"$src","text":"$text"}"""
  private def dCreate(t: String, id: Long, src: String, text: String) =
    rec(t, s"""{"before":null,"after":${dimg(id, src, text)},"op":"c","ts_ms":$seqNo}""")
  private def dUpdate(t: String, id: Long, src: String, o: String, n: String) =
    rec(t, s"""{"before":${dimg(id, src, o)},"after":${dimg(id, src, n)},"op":"u","ts_ms":$seqNo}""")
  private def dDelete(t: String, id: Long, src: String, text: String) =
    rec(t, s"""{"before":${dimg(id, src, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  test("incremental snapshot diff == batch change-class counts at every step") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdiff")
    val pipeline = new CdcPipeline(spark,
      Seq(TableSpec("docs_v1", docSchema, primaryKey = Seq("doc_id")),
        TableSpec("docs_v2", docSchema, primaryKey = Seq("doc_id"))),
      stateDir, sink,
      Seq(StreamingSnapshotDiff.view(spark, stateDir)))

    var v1 = Map.empty[Long, (String, String)] // id -> (source, text)
    var v2 = Map.empty[Long, (String, String)]
    def expected: Map[String, Long] =
      (v1.keySet ++ v2.keySet).toSeq.map { id =>
        val cls = (v1.get(id), v2.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some((_, ta)), Some((_, tb))) if ta != tb => "changed"
          case _ => "unchanged"
        }
        val src = v1.get(id).orElse(v2.get(id)).get._1
        s"$cls|$src"
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def read: Map[String, Long] =
      sink.docs("snapshot_diff").map { case (id, d) =>
        id -> d("n_docs").asInstanceOf[Long]
      }
    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"), Some(batchId))
      assert(read == expected, s"batch $batchId")
    }

    // v1 lands first: every doc reads 'removed' until v2 catches up
    v1 = Map(1L -> ("web", "aa"), 2L -> ("web", "bb"), 3L -> ("book", "cc"))
    step(0, dCreate("docs_v1", 1, "web", "aa"),
      dCreate("docs_v1", 2, "web", "bb"),
      dCreate("docs_v1", 3, "book", "cc"))
    assert(read == Map("removed|web" -> 2L, "removed|book" -> 1L))

    // v2 arrives: doc1 unchanged, doc2 revised, doc4 brand-new — each id
    // RECLASSIFIES (its 'removed' count retracts as its new class gains)
    v2 = Map(1L -> ("web", "aa"), 2L -> ("web", "b2"), 4L -> ("book", "dd"))
    step(1, dCreate("docs_v2", 1, "web", "aa"),
      dCreate("docs_v2", 2, "web", "b2"),
      dCreate("docs_v2", 4, "book", "dd"))
    assert(read == Map("unchanged|web" -> 1L, "changed|web" -> 1L,
      "removed|book" -> 1L, "added|book" -> 1L))

    // doc2's v2 reverts to the v1 text: changed → unchanged (class flip
    // on an UPDATE, not an add/remove)
    v2 += (2L -> ("web", "bb"))
    step(2, dUpdate("docs_v2", 2, "web", "b2", "bb"))
    assert(read("unchanged|web") == 2L && !read.contains("changed|web"))

    // the only removed doc gets its v2 row: the 'removed|book' class
    // EMPTIES and must leave the sink
    v2 += (3L -> ("book", "cc"))
    step(3, dCreate("docs_v2", 3, "book", "cc"))
    assert(!read.contains("removed|book"))

    // v1-side delete flips doc4's partner-less v2 row... doc1's v1 row
    // deleted → doc1 becomes 'added'
    v1 -= 1L
    step(4, dDelete("docs_v1", 1, "web", "aa"))
    assert(read("added|web") == 1L)

    // replay idempotence
    pipeline.processBatch(
      Seq(dDelete("docs_v1", 1, "web", "aa")).toDF("table", "value", "seq"),
      Some(4L))
    assert(read == expected)
  }
}
