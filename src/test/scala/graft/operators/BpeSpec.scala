package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BPE trainer beyond the q95 gate: the distributed merge sequence must
  * equal an independent in-memory reference implementation (classic toy
  * corpus + the real sf0.001 corpus), segmentation must replay training
  * exactly, and training must be deterministic run-to-run. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Straight-line reference BPE (Sennrich et al. 2016 semantics):
    * naive overlapping pair counts, argmax with (count DESC, l, r)
    * tiebreak, greedy left-to-right non-overlapping merge. */
  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var syms: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.split("").toVector, c) }
    val out = scala.collection.mutable.Buffer.empty[(String, String)]
    var continue = true
    while (out.size < n && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        out += best
        syms = syms.map { case (s, c) => (greedyMerge(s, best), c) }
      }
    }
    out.toSeq
  }

  private def greedyMerge(s: Vector[String],
      p: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == p._1 && s(i + 1) == p._2) {
        b += (p._1 + p._2); i += 2
      } else { b += s(i); i += 1 }
    }
    b.result()
  }

  private val toy = Map("low" -> 5L, "lower" -> 2L,
    "newest" -> 6L, "widest" -> 3L)

  test("toy corpus: merge sequence equals the reference implementation " +
      "(and the hand-computable first merges)") {
    val words = toy.toSeq.toDF("w", "c")
    val got = Bpe.train(words, nMerges = 6).map(m => (m.left, m.right))
    assert(got == refTrain(toy, 6), s"got $got")
    // hand check: es(9) then est(9) lead — the published worked example
    assert(got.take(2) == Seq(("e", "s"), ("es", "t")), got)
  }

  test("real corpus: distributed trainer equals the reference on " +
      "collected word freqs; deterministic run-to-run") {
    val words = Bpe.wordFreqs(
      graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val freqs = words.as[(String, Long)].collect().toMap
    val a = Bpe.train(words, nMerges = 10)
    val b = Bpe.train(words, nMerges = 10)
    assert(a == b, "training must be deterministic")
    assert(a.map(m => (m.left, m.right)) == refTrain(freqs, 10))
  }

  test("segment replays training: re-segmenting the vocabulary with the " +
      "trained merges equals the trainer's final symbol state") {
    val words = toy.toSeq.toDF("w", "c")
    val merges = Bpe.train(words, nMerges = 6)
    // reference final state: apply the same merges sequentially
    val expect = toy.keys.map { w =>
      w -> merges.foldLeft(w.split("").toVector)((s, m) =>
        greedyMerge(s, (m.left, m.right)))
    }.toMap
    val got = words.select(col("w"), Bpe.segment(col("w"), merges).as("sym"))
      .as[(String, Seq[String])].collect().toMap
    assert(got.view.mapValues(_.toVector).toMap == expect)
  }

  test("saveMerges/loadMerges round-trips the table in rank order") {
    val words = toy.toSeq.toDF("w", "c")
    val merges = Bpe.train(words, nMerges = 6)
    val path = tmpDir("bpemerges")
    Bpe.saveMerges(spark, merges, path)
    assert(Bpe.loadMerges(spark, path) == merges)
  }

  test("q98 piece counts: pieces never exceed characters and shrink " +
      "after merges for at least one language") {
    val rows = graft.SparkEntry
      .queries("q98_bpe_apply")(spark, "/root/testdata/sf0.001")
      .select("n_chars", "n_pieces").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (nc, np) => np <= nc && np > 0 })
    assert(rows.exists { case (nc, np) => np < nc },
      "10 merges must compress something")
  }
}
