package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization pinned beyond the (approximate-by-design) q97
  * gate row: the ADC identity against a driver-side recomputation, the
  * Lloyd centroid-mean invariant, determinism, and recall against exact
  * euclidean brute force on the real embeddings. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  // planted data: 3 well-separated clusters in 8 dims, ids 0..59
  private def planted: Seq[(Long, Seq[Double])] = {
    val centers = Seq(
      Seq(10.0, 0, 0, 0, -10, 0, 0, 0),
      Seq(0.0, 10, 0, 0, 0, -10, 0, 0),
      Seq(0.0, 0, 10, 0, 0, 0, -10, 0))
    (0 until 60).map { i =>
      val c = centers(i % 3)
      // deterministic small jitter, unique per point
      (i.toLong, c.zipWithIndex.map { case (x, d) =>
        x + ((i * 7 + d * 3) % 5) * 0.01 })
    }
  }

  private def plantedDf = planted.toDF("vec_id", "v")

  test("fit is deterministic and every centroid is the exact mean of " +
      "its assigned subvectors") {
    val m = 2; val ds = 4
    val a = Pq.fit(plantedDf, m = m, k = 4, maxIters = 5)
    val b = Pq.fit(plantedDf, m = m, k = 4, maxIters = 5)
    assert(a == b, "fit must be deterministic")

    val codes = Pq.encode(a, plantedDf)
      .as[(Long, Seq[Int])].collect().toMap
    val byVec = planted.toMap
    for (sub <- 0 until m; c <- 0 until 4) {
      val assigned = codes.collect { case (id, cs) if cs(sub) == c =>
        byVec(id).slice(sub * ds, sub * ds + ds) }.toSeq
      if (assigned.nonEmpty) {
        val mean = (0 until ds).map(d => assigned.map(_(d)).sum / assigned.size)
        val got = a.codebooks(sub)(c)
        assert(mean.zip(got).forall { case (x, y) => math.abs(x - y) < 1e-9 },
          s"sub=$sub code=$c: $got != $mean")
      }
    }
  }

  test("save/load round-trips the model exactly") {
    val model = Pq.fit(plantedDf, m = 2, k = 4, maxIters = 5)
    val path = tmpDir("pqmodel")
    Pq.save(spark, model, path)
    assert(Pq.loadModel(spark, path) == model)
  }

  test("ADC self-distance equals the driver-computed quantization error") {
    val model = Pq.fit(plantedDf, m = 2, k = 4, maxIters = 5)
    val codes = Pq.encode(model, plantedDf)
    val probes = plantedDf.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val adc = Pq.adcSearch(model, codes, probes, topK = 60,
        excludeSelf = false)
      .filter(col("query_id") === col("neighbor_id"))
      .select("query_id", "approx_d2").as[(Long, Double)].collect().toMap
    val codeMap = codes.as[(Long, Seq[Int])].collect().toMap
    val byVec = planted.toMap
    for (q <- 0L until 3L) {
      val v = byVec(q)
      val err = (0 until 2).map { sub =>
        val cv = model.codebooks(sub)(codeMap(q)(sub))
        v.slice(sub * 4, sub * 4 + 4).zip(cv)
          .map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
      assert(math.abs(adc(q) - err) < 1e-5, s"q=$q: ${adc(q)} vs $err")
    }
  }

  test("reranked recall vs exact euclidean brute force on real " +
      "embeddings; reranked distances are exact") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    val model = Pq.fit(e, m = 16, k = 16, maxIters = 5)
    val codes = Pq.encode(model, e)
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val reranked = Pq
      .adcSearchReranked(model, codes, e, probes, topK = 5)
      .select("query_id", "neighbor_id", "d2")
      .as[(Long, Long, Double)].collect()
    val got = reranked.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap

    // exact euclidean per probe, driver-side (corpus is tiny here)
    val all = e.as[(Long, Seq[Float])].collect()
    val exactD = all.filter(_._1 < 5).map { case (q, qv) =>
      q -> all.filter(_._1 != q).map { case (id, v) =>
        (id, qv.zip(v).map { case (a, b) =>
          (a - b).toDouble * (a - b) }.sum)
      }.toMap
    }.toMap
    val exactTop = exactD.view.mapValues(
      _.toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet)

    // the shortlist is the approximate part; the 10× depth captures
    // most of the true top-5 (measured 0.88 on this corpus), and the
    // exact pass orders what it captured perfectly
    val recall = exactTop.map { case (q, ex) =>
      got(q).intersect(ex).size.toDouble / ex.size }.sum / exactTop.size
    assert(recall >= 0.7, s"mean reranked recall@5 $recall below 0.7")

    // every emitted distance is the EXACT distance, not the ADC estimate
    for ((q, id, d2) <- reranked)
      assert(math.abs(d2 - exactD(q)(id)) < 1e-4,
        s"q=$q id=$id reranked d2=$d2 exact=${exactD(q)(id)}")
  }

  test("IVF-PQ: full-depth shortlist equals brute force within the " +
      "probed cells, ranks and distances included") {
    val dir = "/root/testdata/sf0.001"
    // depth ≥ cell population ⇒ the ADC stage only selects cells, the
    // exact re-rank decides everything — output must be exactly brute
    // force restricted to the probed cells
    val got = Pq.ivfPqSearch(spark, dir, topK = 5, nprobe = 2,
        shortlist = 1000)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)))
      .toMap

    val idx = Similarity.ivfIndexPath(spark, dir)
    val cents = spark.read.parquet(s"$idx/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val all = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    for ((q, _, qv) <- all.filter(_._1 < 5)) {
      val qd = qv.map(_.toDouble)
      val probed = cents.map { case (lbl, c) =>
        (qd.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, lbl)
      }.sortBy(identity).take(2).map(_._2).toSet
      val expect = all
        .filter(r => probed.contains(r._2) && r._1 != q)
        .map { case (id, _, v) =>
          (id, qd.zip(v.map(_.toDouble))
            .map { case (a, b) => (a - b) * (a - b) }.sum)
        }.sortBy { case (id, d) => (d, id) }.take(5)
      val g = got(q)
      assert(g.map(_._1).toSeq == expect.map(_._1).toSeq,
        s"q=$q got ${g.map(_._1).toSeq} expect ${expect.map(_._1).toSeq}")
      for (((_, gd), (_, ed)) <- g.zip(expect))
        assert(math.abs(gd - ed) < 1e-4, s"q=$q d2 $gd vs $ed")
    }
  }
}
