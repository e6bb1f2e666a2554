package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** k-means on planted well-separated clusters: exact membership
  * recovery, centroid == cluster mean, deterministic across runs. */
class KMeansSpec extends SparkSuite {
  import spark.implicits._

  // 3 clusters of 30 points in 8 dims, centers far apart (separation 20,
  // within-cluster noise ±0.5) — Lloyd's from farthest-point init must
  // recover the planted partition exactly
  private val rnd = new scala.util.Random(5)
  private val centers = Seq(
    Seq.fill(8)(0.0), Seq.fill(8)(20.0),
    (0 until 8).map(i => if (i % 2 == 0) -20.0 else 20.0))
  private val points: Seq[(Long, Seq[Double], Int)] =
    (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, centers(c).map(x => x + rnd.nextDouble() - 0.5), c)
    }

  private def vecs = points.map(p => (p._1, p._2)).toDF("vec_id", "v")

  test("recovers planted clusters exactly; centroids equal cluster means") {
    val model = KMeans.fit(vecs, k = 3, maxIters = 10)
    val got = model.assign(vecs).select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap

    // same model cluster for every planted cluster-mate, different across
    val byPlanted = points.groupBy(_._3)
      .map { case (c, ps) => c -> ps.map(p => got(p._1)).toSet }
    assert(byPlanted.values.forall(_.size == 1), s"split cluster: $byPlanted")
    assert(byPlanted.values.flatten.toSet.size == 3, s"merged: $byPlanted")

    // each centroid is the mean of its assigned points
    val assignInv = byPlanted.map { case (c, m) => m.head -> c }
    model.centroids.zipWithIndex.foreach { case (ctr, i) =>
      val mine = points.filter(_._3 == assignInv(i)).map(_._2)
      val mean = mine.transpose.map(xs => xs.sum / xs.size)
      ctr.zip(mean).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"centroid $i off: $a vs $b") }
    }

    // deterministic: a second fit returns identical centroids
    val again = KMeans.fit(vecs, k = 3, maxIters = 10)
    assert(again.centroids == model.centroids)
  }

  test("diversitySample keeps the exact closest-to-centroid points per cluster") {
    val model = KMeans.fit(vecs, k = 3, maxIters = 10)
    val sampled = model match { case m =>
      KMeans.diversitySample(m, vecs, perCluster = 2)
        .select("vec_id", "cluster")
        .as[(Long, Int)].collect()
    }
    assert(sampled.length == 6)
    assert(sampled.map(_._2).groupBy(identity).values.forall(_.length == 2))

    // per cluster, the kept ids are exactly the 2 with the smallest true
    // distance to that centroid (id tiebreak)
    val assign = model.assign(vecs).select("vec_id", "cluster", "dist2")
      .as[(Long, Int, Double)].collect()
    val expected = assign.groupBy(_._2).toSeq.flatMap { case (c, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(2).map(r => (r._1, c))
    }.toSet
    assert(sampled.toSet == expected)
  }

  private def topkOf(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val topk = udaf(new graft.functions.TopKAggregator(k))
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .as[(Long, Int, (Double, Long))].collect()
      .map { case (q, pos, (s, id)) => (q, pos + 1, id, s) }.toSet
  }

  test("ivfSearch: nprobe=all equals brute force; nprobe=1 stays in the cell") {
    val model = KMeans.fit(vecs, k = 3, maxIters = 10)
    val probes = points.take(2).map(p => (p._1, p._2)).toDF("query_id", "qv")

    val bruteForce = topkOf(
      vecs.toDF("neighbor_id", "v").join(broadcast(probes),
        col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(Similarity.cosine(col("qv"), col("v")), 6).as("score")), 5)

    // probing every cell is exhaustive search
    val full = KMeans.ivfSearch(model, vecs, probes, k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == bruteForce)

    // nprobe=1: every neighbor comes from the probe's own planted cluster
    // (well-separated data routes each probe to its home cell)
    val one = KMeans.ivfSearch(model, vecs, probes, k = 5, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect()
    val planted = points.map(p => p._1 -> p._3).toMap
    assert(one.nonEmpty &&
      one.forall(r => planted(r._3) == planted(r._1)))
  }

  test("k exceeding distinct points keeps empty-cluster centroids stable") {
    val tiny = points.take(4)
    val model = KMeans.fit(
      tiny.map(p => (p._1, p._2)).toDF("vec_id", "v"), k = 3, maxIters = 3)
    assert(model.centroids.size == 3)
    // every point still assigned to its planted center's seed
    val got = model.assign(tiny.map(p => (p._1, p._2)).toDF("vec_id", "v"))
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(got.size == 4)
  }

  test("semDedup == within-cluster brute force; keep-lowest-id; planted dups flagged") {
    // plant two exact copies of point 0 and a near-copy of point 1 —
    // all land in their source's cluster on this separated data
    val extra = Seq(
      (100L, points(0)._2), (101L, points(0)._2),
      (102L, points(1)._2.map(_ + 0.001)))
    val all = points.map(p => (p._1, p._2)) ++ extra
    val df = all.toDF("vec_id", "v")
    val model = KMeans.fit(df, k = 3, maxIters = 10)
    val tau = 0.9999

    val got = KMeans.semDedup(df, model, tau)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // independent brute force with the engine's exact arithmetic:
    // left-to-right double dot fold, HALF_UP rounding to 6 before τ
    val assign = model.assign(df).select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = all.toMap
    val expected = all.map(_._1).flatMap { b =>
      val dups = all.map(_._1)
        .filter(a => a < b && assign(a) == assign(b))
        .map { a =>
          val (va, vb) = (byId(a), byId(b))
          r6(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))))
        }
        .filter(_ >= tau)
      if (dups.isEmpty) None
      else Some(b -> ((assign(b), dups.size.toLong, dups.max)))
    }.toMap
    assert(got == expected)

    // the planted copies are removed against their lower-id original;
    // the original (the global min id) can never be removed
    assert(!got.contains(0L))
    assert(got(100L)._3 == 1.0 && got(101L)._3 == 1.0)
    assert(got(101L)._2 == 2L, "101 duplicates both 0 and 100")
    assert(got.contains(102L), "near-copy above τ flagged")
  }

  test("adaptiveK: floor 8 at gate scale, k ∝ n beyond, cell size bounded") {
    // the gate corpora (500 / 5 000 vectors) must stay in the k = 8
    // regime the unrolled DuckDB trainer oracles replicate
    assert(KMeans.adaptiveK(500) == 8)
    assert(KMeans.adaptiveK(5000) == 8)
    assert(KMeans.adaptiveK(8 * 1024) == 8)
    // beyond the floor, k grows so the EXPECTED cell stays ≤ 1024
    assert(KMeans.adaptiveK(8 * 1024 + 1) == 9)
    assert(KMeans.adaptiveK(1000000) == 977)
    for (n <- Seq(10000L, 123456L, 10000000L, 1000000000L))
      assert(n.toDouble / KMeans.adaptiveK(n) <= 1024.0,
        s"expected cell size over target at n=$n")
  }

  test("bandedPairs: a planted giant cluster sub-bands to a bounded " +
      "pair count; an under-threshold cluster keeps ALL pairs") {
    val n = 1000
    val r = new scala.util.Random(11)
    val giant = (0 until n).map(i =>
        (i.toLong, Seq.fill(4)(r.nextDouble()), math.sqrt(1.0), 0))
      .toDF("vec_id", "v", "nrm", "cluster")
    val maxSz = 100
    val got = KMeans.bandedPairs(giant, maxSz).count()
    // never quadratic: C(1000,2) = 499 500 unbanded
    assert(got < 150000L, s"giant cluster went near-quadratic: $got pairs")
    // exact bound: the banding formula is deterministic (xxhash64 of
    // vec_id mod ⌈n/maxSz⌉), so Σ_band C(size_b, 2) computed
    // independently must equal the join's output exactly
    val nBands = (n + maxSz - 1) / maxSz
    val expected = giant
      .select(pmod(xxhash64(col("vec_id")), lit(nBands.toLong)).as("band"))
      .groupBy("band").count().as[(Long, Long)].collect()
      .map { case (_, c) => c * (c - 1) / 2 }.sum
    assert(got == expected, s"banded pair count $got != $expected")

    // threshold not reached → ONE band → the full within-cluster set
    val small = giant.limit(50)
    assert(KMeans.bandedPairs(small, maxSz).count() == 50L * 49 / 2)
  }

  test("save/load round-trips the model; assignments identical") {
    val vecs = points.map(p => (p._1, p._2)).toDF("vec_id", "v")
    val model = KMeans.fit(vecs, k = 3, maxIters = 5)
    val path = tmpDir("kmeans-model") + "/m"
    model.save(spark, path)
    val loaded = KMeans.loadModel(spark, path)
    assert(loaded.centroids == model.centroids) // exact doubles, not approx
    val a = model.assign(vecs).as[(Long, Int, Double)].collect().toSet
    val b = loaded.assign(vecs).as[(Long, Int, Double)].collect().toSet
    assert(a == b)
  }

  test("q117 margins: planted separation scores near 1, an in-memory " +
      "reference agrees per vector") {
    val dir = tmpDir("margins")
    points.map(p => (p._1, p._2.map(_.toFloat), p._3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir + "/embeddings.parquet")
    val out = graft.SparkEntry.queries("q117_cluster_margins")(spark, dir)
      .as[(Int, Long, Double, Double)].collect()
    // k = 8 over-segments the 3 planted groups: clusters that keep a
    // WHOLE planted group (30 members) must score near 1 (separation 20
    // vs radius 0.5), while split fragments legitimately score low —
    // exactly the go/no-go signal the diagnostic exists to produce
    val whole = out.filter(_._2 == 30)
    assert(whole.nonEmpty, out.mkString(", "))
    assert(whole.forall(_._4 > 0.9), out.mkString(", "))
    assert(out.exists(r => r._2 > 0 && r._2 < 30 && r._4 < 0.6),
      out.mkString(", "))
    // in-memory reference: per-vector best/second distances over the
    // SAME fitted centroids (deterministic trainer, trained on the same
    // float-round-tripped values the parquet path feeds the engine)
    val vecsF = points.map(p => (p._1, p._2.map(_.toFloat.toDouble)))
      .toDF("vec_id", "v")
    val model = KMeans.fit(vecsF, k = 8, maxIters = 5)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = points
      .map { p =>
        val v = p._2.map(_.toFloat.toDouble) // float round-trip like parquet
        val ds = model.centroids.map { c =>
          val cn = c.map(x => x * x).sum
          val vc = v.zip(c).map { case (a, b) => a * b }.sum
          cn - 2.0 * vc
        }
        val vv = v.map(x => x * x).sum
        val c1 = ds.indices.minBy(i => (ds(i), i))
        val d1 = math.sqrt(math.max(ds(c1) + vv, 0.0))
        val d2 = math.sqrt(math.max(
          ds.indices.filter(_ != c1).map(ds(_)).min + vv, 0.0))
        val sil = if (math.max(d1, d2) > 0) (d2 - d1) / math.max(d1, d2)
          else 0.0
        (c1, r6(d2 - d1), r6(sil))
      }
      .groupBy(_._1)
      .map { case (c, xs) =>
        (c, xs.size.toLong,
          r6(xs.map(_._2).sum / xs.size), r6(xs.map(_._3).sum / xs.size))
      }.toSet
    assert(out.toSet == expected)
  }
}
