package graft.streaming

import graft.SparkSuite

/** Streaming embedding decontamination == batch q140 recompute at every
  * step of a replayed embeddings changelog — including the GLOBAL
  * direction: a benchmark-side insert/update/delete must flip verdicts
  * on corpus vectors the batch never touched (new nearest neighbor,
  * n_near increments/decrements, contamination appearing/vanishing),
  * and an emptied benchmark retracts every corpus row. */
class StreamingEmbeddingDeconSpec extends SparkSuite
    with EmbeddingCdcFixture {
  import spark.implicits._

  // ids ≡ 0 mod 29 are the benchmark; 4-dim unit-ish vectors chosen so
  // cosines land on both sides of the 0.4 threshold
  private val hold = Map(
    0L -> Seq(1.0, 0.0, 0.0, 0.0),
    29L -> Seq(0.0, 1.0, 0.0, 0.0))
  private val e1 = Seq(0.9, 0.1, 0.0, 0.0)   // near hold 0
  private val e2 = Seq(0.0, 0.05, 1.0, 0.0)  // near nothing
  private val e3 = Seq(0.1, 0.9, 0.1, 0.0)   // near hold 29

  /** Batch q140's arithmetic over current state, in plain Scala. */
  private def expected(state: Map[Long, Seq[Double]])
      : Map[String, (Long, Double, Long, Boolean)] = {
    val h = state.filter(_._1 % 29 == 0)
    val c = state.filter(_._1 % 29 != 0)
    if (h.isEmpty) Map.empty
    else c.map { case (cid, cv) =>
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      val scored = h.toSeq.map { case (hid, hv) =>
        (r6(dot(cv, hv) / (math.sqrt(dot(cv, cv)) * math.sqrt(dot(hv, hv)))),
          hid)
      }
      val maxCos = scored.map(_._1).max
      val nearest = scored.filter(_._1 == maxCos).map(_._2).min
      val nNear = scored.count(_._1 >= 0.4).toLong
      cid.toString -> ((nearest, maxCos, nNear, nNear > 0))
    }
  }

  private def sinkDocs(sink: InMemoryUpsertSink)
      : Map[String, (Long, Double, Long, Boolean)] =
    sink.docs("embedding_decon").map { case (id, d) =>
      id -> ((d("nearest_holdout").asInstanceOf[Long],
        d("max_cos").asInstanceOf[Double],
        d("n_near").asInstanceOf[Long],
        d("contaminated").asInstanceOf[Boolean]))
    }.toMap

  test("decon report == batch recompute; benchmark changes re-verdict " +
      "untouched corpus rows; emptied benchmark retracts everything") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sedecon")
    val pipeline = new CdcPipeline(spark, embSources, stateDir, sink,
      Seq(StreamingEmbeddingDecon.deconView(spark, stateDir)))
    var state = Map.empty[Long, Seq[Double]]

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkDocs(sink) == expected(state),
        s"batch $batchId: sink != batch q140 recompute")
    }

    // benchmark + one corpus vector arrive together
    state = Map(0L -> hold(0L), 1L -> e1)
    step(0, create(0L, hold(0L)), create(1L, e1))
    assert(sinkDocs(sink)("1")._4, "e1 sits next to benchmark 0")

    // corpus-side growth touches only its own rows
    state += (2L -> e2)
    step(1, create(2L, e2))
    assert(!sinkDocs(sink)("2")._4, "e2 is far from every benchmark vec")

    // a BENCHMARK insert re-verdicts corpus rows this batch never
    // touched: e3 arrives with hold 29 in the same batch, and e2's
    // nearest/contamination recompute against the grown benchmark
    state += (29L -> hold(29L), 3L -> e3)
    step(2, create(29L, hold(29L)), create(3L, e3))
    assert(sinkDocs(sink)("3")._1 == 29L)

    // a BENCHMARK delete re-verdicts everything: rows whose nearest was
    // 29 fall back to benchmark 0
    state -= 29L
    step(3, delete(29L, hold(29L)))
    assert(sinkDocs(sink)("3")._1 == 0L)
    assert(!sinkDocs(sink)("3")._4, "e3 is far from benchmark 0")

    // corpus delete retracts its row only
    state -= 1L
    step(4, delete(1L, e1))
    assert(!sinkDocs(sink).contains("1"))

    // emptying the benchmark retracts every corpus row (batch q140
    // yields zero rows with an empty holdout side)
    state -= 0L
    step(5, delete(0L, hold(0L)))
    assert(sinkDocs(sink).isEmpty)
  }

  test("replayed batch is idempotent across both state stores") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sedecon-replay")
    val pipeline = new CdcPipeline(spark, embSources, stateDir, sink,
      Seq(StreamingEmbeddingDecon.deconView(spark, stateDir)))

    pipeline.processBatch(Seq(create(0L, hold(0L)), create(1L, e1))
      .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create(29L, hold(29L)), create(3L, e3))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkDocs(sink)
    assert(after == expected(Map(0L -> hold(0L), 1L -> e1,
      29L -> hold(29L), 3L -> e3)))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkDocs(sink) == after)
  }
}
