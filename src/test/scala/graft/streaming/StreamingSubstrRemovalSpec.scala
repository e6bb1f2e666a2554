package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Incremental span removal == batch q122 recompute at every step of a
  * replayed document changelog — including the dup-status flip on
  * UNTOUCHED residents (the second occurrence of a window arriving in a
  * batch doc must cut a span inside a resident the batch never touched,
  * and the delete dropping the count back to 1 must restore it). */
class StreamingSubstrRemovalSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String) =
    s"""{"doc_id":"$id","text":"$text"}"""
  private def create(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, text)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, oldT: String, newT: String): (String, String, Long) =
    rec(s"""{"before":${img(id, oldT)},"after":${img(id, newT)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":${img(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")

  // a 62-char shared block of all-distinct characters (deliberately
  // aperiodic — a periodic block would duplicate windows WITHIN one
  // carrier): every 50-char window inside it is identical across
  // carriers, so a second carrier covers the whole block in both
  private val shared =
    "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private def carrier(id: String) = s"${id}u1234567890 $shared ${id}v0987654321"
  private val unrelated = "q" * 10 + "w" * 9  // < 50 chars: no window at all

  /** Character-level batch q122 over the current state, in plain Scala
    * (independent of both the view and the batch query's fold). */
  private def batchRecompute(state: DataFrame): Set[(String, String, Long)] = {
    val docs = state.select("doc_id", "text").as[(String, String)].collect()
    val counts = new scala.collection.mutable.HashMap[String, Int]
    for ((_, t) <- docs; i <- 0 to t.length - 50)
      counts.update(t.substring(i, i + 50),
        counts.getOrElse(t.substring(i, i + 50), 0) + 1)
    docs.map { case (id, t) =>
      val cov = new Array[Boolean](t.length)
      for (i <- 0 to t.length - 50; if counts(t.substring(i, i + 50)) >= 2;
           p <- i until i + 50) cov(p) = true
      val cleaned = t.indices.collect { case p if !cov(p) => t(p) }.mkString
      (id, cleaned, (t.length - cleaned.length).toLong)
    }.toSet
  }

  private def sinkRows(sink: InMemoryUpsertSink): Set[(String, String, Long)] =
    sink.docs("substr_removal").map { case (id, d) =>
      (id, d("cleaned").toString, d("n_removed").asInstanceOf[Long])
    }.toSet

  test("incremental cleaned texts equal batch q122 recompute after every " +
      "batch, including dup flips cutting and restoring untouched residents") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssubstr")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSubstrRemoval.substrRemovalView(spark, stateDir)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch recompute")
    }

    // one carrier alone: every window unique, nothing removed
    step(0, create("a", carrier("a")), create("x", unrelated))
    assert(sinkRows(sink).forall(_._3 == 0L))

    // the second carrier arrives: a's shared block must be cut even
    // though a is UNTOUCHED this batch — the 1→2 flip re-emit path
    step(1, create("b", carrier("b")))
    val afterB = sinkRows(sink)
    assert(afterB.count(_._3 > 0) == 2, s"both carriers cut: $afterB")
    assert(afterB.forall { case (id, cleaned, _) =>
      !(id == "a" || id == "b") || !cleaned.contains(shared) })
    // the common run is "u1234567890 " + shared + " " (75 chars, spanning
    // a's indices 1..75): only the leading id char and the unique tail
    // survive the cut
    assert(afterB.contains(("a", "aav0987654321", 75L)),
      s"unique remainder must survive: $afterB")

    // delete b: counts fall back to 1 — a's span must be RESTORED
    // without a ever being touched (the 2→1 flip)
    step(2, delete("b", carrier("b")))
    assert(sinkRows(sink).forall(_._3 == 0L))
    assert(sinkRows(sink).contains((
      "a", carrier("a"), 0L)))

    // multiplicity inside ONE doc: a 50-char block repeated twice in the
    // same document is already duplicated — the whole 100 chars go
    val block = "0123456789" * 5
    step(3, create("s", block + block))
    assert(sinkRows(sink).exists(p => p._1 == "s" && p._2 == "" &&
      p._3 == 100L))

    // update rewrites s to unrelated text: its windows decrement away
    step(4, update("s", block + block, unrelated))
    assert(sinkRows(sink).exists(p => p._1 == "s" && p._3 == 0L))
  }

  test("non-BMP text: removal spans are code-point aligned (emoji carrier)") {
    // the shared 50-code-point run sits after an emoji prefix; window
    // starts must count code points (Spark substr semantics) or the cut
    // shifts by one UTF-16 unit per emoji and slices surrogate pairs
    val run = ("🚀" * 10) +
      "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 50 cps, 60 UTF-16 units
    // tails start with DIFFERENT chars so no shared window extends past
    // the run (a common trailing space would be covered too)
    val c1 = "😀😀p" + run + "Xtail one"
    val c2 = "qq" + run + "Zother tail"

    def cps(s: String): Array[Int] = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < s.length) {
        val c = s.codePointAt(i); b += c; i += Character.charCount(c)
      }
      b.result()
    }
    // code-point-level recompute (batchRecompute above is UTF-16 and only
    // valid for the ASCII fixtures)
    def recomputeCp(state: DataFrame): Set[(String, String, Long)] = {
      val docs = state.select("doc_id", "text").as[(String, String)].collect()
      val counts = new scala.collection.mutable.HashMap[String, Int]
      for ((_, t) <- docs; c = cps(t); i <- 0 to c.length - 50)
        counts.update(new String(c, i, 50),
          counts.getOrElse(new String(c, i, 50), 0) + 1)
      docs.map { case (id, t) =>
        val c = cps(t)
        val cov = new Array[Boolean](c.length)
        for (i <- 0 to c.length - 50; if counts(new String(c, i, 50)) >= 2;
             p <- i until i + 50) cov(p) = true
        val kept = c.indices.filter(p => !cov(p)).map(c).toArray
        (id, new String(kept, 0, kept.length), (c.length - kept.length).toLong)
      }.toSet
    }

    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssubstr-nonbmp")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSubstrRemoval.substrRemovalView(spark, stateDir)))

    pipeline.processBatch(Seq(create("e1", c1)).toDF("table", "value", "seq"),
      Some(0L))
    assert(sinkRows(sink).forall(_._3 == 0L))

    pipeline.processBatch(Seq(create("e2", c2)).toDF("table", "value", "seq"),
      Some(1L))
    val after = sinkRows(sink)
    assert(after == recomputeCp(pipeline.state("documents")))
    assert(after.contains(("e1", "😀😀pXtail one", 50L)),
      s"exactly the 50-cp run leaves; the emoji prefix stays intact: $after")

    pipeline.processBatch(Seq(delete("e2", c2)).toDF("table", "value", "seq"),
      Some(2L))
    assert(sinkRows(sink).contains(("e1", c1, 0L)),
      "delete restores the resident byte-identically")
  }

  test("replayed batch is idempotent (state merges skip, sink converges)") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("ssubstr-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingSubstrRemoval.substrRemovalView(spark, stateDir)))

    pipeline.processBatch(Seq(create("r1", carrier("r1")))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("r2", carrier("r2")), create("r3", unrelated))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after.count(_._3 > 0) == 2)

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }
}
