package graft.operators

import graft.SparkSuite

/** Semantic pins for the sketch-calibration and layout queries
  * (q130–q134) over the sf0.001 fixture — the DuckDB gate hash-matches
  * their exact values; these assert the PROPERTIES the numbers must
  * obey (estimator bounds, quantile sandwich, partition invariants)
  * so a wrong-but-consistent implementation can't slip through. */
class LayoutAndCalibrationSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q130: HLL estimate is positive and within the m=256 small-range " +
      "envelope of the exact count") {
    val rows = run("q130_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      val zeros = r.getAs[Long]("n_zero_regs")
      assert(est > 0.0)
      assert(zeros >= 0 && zeros <= 256)
      // raw (uncorrected) HLL: generous envelope — the query reports
      // raw-vs-exact as its whole point; the spec pins it's not garbage
      assert(math.abs(est - exact) / exact < 0.5,
        s"source=${r.getString(0)} exact=$exact est=$est")
    }
  }

  test("q131: histogram quantile is ≤ exact and within one bucket width; " +
      "quantiles are monotone in p") {
    val rows = run("q131_hist_quantiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def g(n: String): Long = r.getAs[Long](n)
      Seq("p50", "p90", "p99").foreach { p =>
        val exact = g(s"${p}_exact"); val est = g(s"${p}_est")
        assert(est <= exact && exact - est < 64, s"$p: exact=$exact est=$est")
      }
      assert(g("p50_exact") <= g("p90_exact") && g("p90_exact") <= g("p99_exact"))
    }
  }

  test("q132: α=0.5 weights sum to 1 and up-sample small sources") {
    val rows = run("q132_temperature_mix").collect()
    assert(rows.nonEmpty)
    val ws = rows.map(_.getAs[Double]("weight"))
    assert(math.abs(ws.sum - 1.0) < 1e-4 * rows.length)
    // flattening property: epochs (= budget·p_i/n_i) strictly decreases
    // as n_i grows — smaller sources are repeated more
    val byN = rows.sortBy(_.getAs[Long]("n_tokens"))
      .map(_.getAs[Double]("epochs"))
    assert(byN.zip(byN.tail).forall { case (a, b) => a >= b })
  }

  test("q133: buckets partition the corpus evenly and are disjoint " +
      "z-ranges") {
    val rows = run("q133_zorder_layout").collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == (1 to 16))
    val total = rows.map(_.getAs[Long]("n")).sum
    val docs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(total == docs)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1) // ntile balance
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("z_hi") <= b.getAs[Long]("z_lo"))
    }
  }

  test("q134: estimates track exact Jaccard within 3σ of the 64-slot " +
      "binomial, and pairs are the ≥0.8 verified set") {
    val rows = run("q134_minhash_calibration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Double]("jaccard_exact")
      val est = r.getAs[Double]("jaccard_est")
      val err = r.getAs[Double]("abs_err")
      assert(exact >= 0.8)
      // σ ≈ √(j(1−j)/64) ≤ 0.0625 at j ≥ 0.8 → 3σ < 0.19
      assert(err < 0.19, s"pair=(${r.get(0)},${r.get(1)}) $exact vs $est")
      assert(math.abs(err - math.abs(exact - est)) < 1e-6 + 5e-7)
    }
  }

  test("q142: rendezvous assignment matches an md5 replica; a 9th shard " +
      "siphons ~1/9 while mod-hashing would move ~8/9") {
    val rows = run("q142_rendezvous_sharding").collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    assert(nDocs == docs.count(), "every doc lands on exactly one shard")

    // in-memory replica of the assignment rule over all docs
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    def w(s: Int, d: Long): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$s|$d").substring(0, 15), 16)
    def shardOf(d: Long, n: Int): Int =
      (0 until n).maxBy(s => (w(s, d), s))
    val expected = ids.groupBy(shardOf(_, 8)).map { case (s, ds) =>
      s -> ((ds.length.toLong,
        ds.count(d => shardOf(d, 9) == 8).toLong,
        ds.count(d => d % 8 != d % 9).toLong))
    }
    val got = rows.map(r => r.getAs[Int]("shard") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_moving"),
        r.getAs[Long]("n_mod_moving")))).toMap
    assert(got == expected)

    // elasticity: rendezvous moves a ~1/9 minority; mod moves a large
    // majority of the same docs — the whole argument for the operator
    val moved = rows.map(_.getAs[Long]("n_moving")).sum.toDouble / nDocs
    val modMoved = rows.map(_.getAs[Long]("n_mod_moving")).sum.toDouble / nDocs
    assert(moved > 0.02 && moved < 0.25, s"rendezvous moved $moved")
    assert(modMoved > 0.7, s"mod-hash moved $modMoved")
    assert(modMoved > 4 * moved)
  }
}
