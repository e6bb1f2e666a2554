package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Empirical scale-growth audit of the dedup ladder (r12 VERDICT #3).
  * Every "∝ collisions, never all-pairs" claim in the dedup family
  * rested on plan shape; this spec MEASURES the growth law once: a
  * deterministic corpus generator plants a fixed duplicate density
  * (10% exact + 10% near duplicates, each derived from its own unique
  * base), materializes a 1× and a 10× corpus under target/, runs the
  * pair-table build and q20/q21/q22/q36/q141 on both, and asserts the
  * pair table grows EXACTLY with the planted duplicates — 10.0×, not
  * the ~100× an all-pairs formulation would show — with banded
  * candidate growth bounded. Wall times and row counts print as a
  * machine-readable JSON line; the committed SCALE_GROWTH.md holds one
  * measured table.
  *
  * Generator contract: 60-word docs over a 200-word vocabulary (two
  * random docs share Jaccard ≈ 0.18 — far under the 0.8 threshold, so
  * planted pairs are the ONLY pairs); near-duplicates replace the last
  * 3 words of their base (3 of 58 shingles change per side → Jaccard
  * ≈ 55/61 ≈ 0.90, safely above threshold). */
class ScaleGrowthSpec extends SparkSuite {

  private val Base = 3000 // docs at 1×
  private val Vocab = 200
  private val Words = 60

  private def word(i: Int, j: Int, salt: Int): String = {
    val h = scala.util.hashing.MurmurHash3.productHash((i, j, salt))
    s"w${math.floorMod(h, Vocab)}"
  }
  private def baseText(i: Int): String =
    (0 until Words).map(j => word(i, j, 0)).mkString(" ")
  private def nearText(i: Int): String =
    ((0 until Words - 3).map(j => word(i, j, 0)) ++
      (Words - 3 until Words).map(j => word(i, j, 1))).mkString(" ")

  /** Docs 0..0.8N unique; next 0.1N exact copies of bases 0..; last
    * 0.1N near-duplicates of bases 0.1N.. (disjoint base sets, one
    * derived doc per base → planted pairs = 0.2N exactly). The base
    * index XORs its low bit so every (base, derived) pair has
    * odd-even parity — q141's new(odd)-vs-old(even) contract sees
    * every planted pair (nUnique is even, so a straight mapping would
    * make every pair same-parity and q141 vacuous). */
  private def generate(dir: String, scale: Int): (Long, Long) = {
    val n = Base * scale
    val nUnique = (n * 8) / 10
    val nExact = n / 10
    val nNear = n - nUnique - nExact
    val marker = java.nio.file.Paths.get(dir, "_DONE")
    if (!java.nio.file.Files.exists(marker)) {
      val rows = (0 until n).map { i =>
        val text =
          if (i < nUnique) baseText(i)
          else if (i < nUnique + nExact) baseText((i - nUnique) ^ 1)
          else nearText(nExact + ((i - nUnique - nExact) ^ 1))
        Row(i.toLong, text, "en", s"src${i % 5}", text.length.toLong)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 8),
        StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType),
          StructField("lang", StringType), StructField("source", StringType),
          StructField("n_chars", LongType))))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      java.nio.file.Files.createFile(marker)
    }
    (nExact.toLong, nNear.toLong)
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("pair table grows with planted duplicates, not quadratically") {
    val root = "target/scale-growth"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val report = scala.collection.mutable.LinkedHashMap.empty[String, Any]

    case class Obs(pairRows: Long, pairSec: Double,
        rows: Map[String, Long], secs: Map[String, Double])

    def run(scale: Int): Obs = {
      val dir = s"$root/x$scale-v2" // version the fixture with the generator
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val (nExact, nNear) = generate(dir, scale)
      // the shared build everything downstream reads — timed separately
      // because IT carries the growth law
      val (pairRows, pairSec) = timed {
        Dedup.sharedNearDupPairs(spark, dir, 0.8, 2, 32).count()
      }
      assert(pairRows == nExact + nNear,
        s"x$scale: pair table must hold exactly the planted pairs " +
          s"(expected ${nExact + nNear}, got $pairRows — " +
          "either banding misses planted near-dups or verification " +
          "passes accidental ones)")
      val qs = Seq("q20_dedup_exact", "q21_minhash_lsh", "q22_simhash_pairs",
        "q36_dedup_clusters", "q141_incremental_dedup")
      val results = qs.map { q =>
        val (n, sec) = timed(SparkEntry.queries(q)(spark, dir).count())
        q -> (n, sec)
      }
      report(s"x$scale") = Map(
        "docs" -> Base * scale, "planted_pairs" -> (nExact + nNear),
        "pair_table_rows" -> pairRows, "pair_build_sec" -> pairSec) ++
        results.map { case (q, (n, sec)) =>
          q -> Map("rows" -> n, "sec" -> sec) }.toMap
      Obs(pairRows, pairSec,
        results.map { case (q, (n, _)) => q -> n }.toMap,
        results.map { case (q, (_, s)) => q -> s }.toMap)
    }

    val one = run(1)
    val ten = run(10)

    // THE growth law: exactly 10× pairs at 10× corpus (planted density
    // held constant) — the assertion inside run() already pinned each
    // scale to its planted count; this states the ratio explicitly
    assert(ten.pairRows == 10 * one.pairRows)

    // every consumer's OUTPUT grows at most linearly with slack — an
    // all-pairs regression would show ~100×
    for (q <- one.rows.keys) {
      val ratio = ten.rows(q).toDouble / math.max(one.rows(q), 1L)
      assert(ratio <= 15.0,
        s"$q output grew ${ratio}x on a 10x corpus — super-linear")
    }
    // exact-dedup group count is exactly corpus-linear
    assert(ten.rows("q20_dedup_exact") == 10 * one.rows("q20_dedup_exact"))

    // q141's 4×4-band geometry misses a j≈0.90 pair with p≈1.4%, so it
    // must see nearly every planted odd-even pair at both scales —
    // zero rows here means the parity contract went vacuous again
    for (o <- Seq(one, ten)) {
      val planted = o.rows("q21_minhash_lsh")
      assert(o.rows("q141_incremental_dedup") >= (planted * 9) / 10 &&
        o.rows("q141_incremental_dedup") <= planted,
        s"q141 found ${o.rows("q141_incremental_dedup")} of $planted")
    }

    val json = new StringBuilder("{")
    def render(v: Any): String = v match {
      case m: scala.collection.Map[_, _] => m.map { case (k, x) =>
        s""""$k":${render(x)}""" }.mkString("{", ",", "}")
      case d: Double => f"$d%.3f"
      case other => other.toString
    }
    report.foreach { case (k, v) =>
      if (json.length > 1) json.append(",")
      json.append(s""""$k":${render(v)}""")
    }
    json.append("}")
    info(s"SCALE_GROWTH ${json.result()}")
    println(s"SCALE_GROWTH ${json.result()}")
  }
}
