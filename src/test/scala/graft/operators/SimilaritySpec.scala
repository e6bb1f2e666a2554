package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ANN variants vs the exact brute-force baseline. NOTE the testdata
  * embeddings are geometrically near-random (measured: same-label fraction
  * of true top-5 ≈ 10% = chance, max cosine ≈ 0.4), so high absolute
  * recall is unattainable for ANY bucketed method here — the tests pin
  * (a) exactness of every returned score, (b) recall strictly above the
  * random-scan baseline for the fraction of corpus each method touches,
  * (c) structural invariants (IVF stays inside the routed partition). */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val queries = graft.SparkEntry.queries

  private def result(name: String): Map[(Long, Long), Double] =
    queries(name)(spark, dir)
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap

  private lazy val bruteScores: Map[(Long, Long), Double] = {
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("cv")), 6).as("score"))
      .as[(Long, Long, Double)].collect()
      .map { case (qq, n, s) => (qq, n) -> s }.toMap
  }

  test("brute-force top-k matches full scored ranking") {
    val topk = result("q40_cosine_topk")
    assert(topk.size == 25, "5 queries x k=5")
    // every reported pair carries the exact brute-force score
    topk.foreach { case (pair, s) => assert(bruteScores(pair) == s) }
    // and is genuinely the top-5: no unreported pair scores higher than
    // a query's 5th reported score
    val perQuery = topk.groupBy(_._1._1)
    perQuery.foreach { case (q, rows) =>
      val floor = rows.values.min
      val better = bruteScores.collect {
        case ((`q`, n), s) if s > floor => n
      }.toSet
      val reported = rows.keySet.map(_._2)
      assert(better.subsetOf(reported))
    }
  }

  test("LSH ANN: exact scores, recall above the random-scan baseline") {
    val exact = result("q40_cosine_topk").keySet
    val lsh = result("q41_ann_lsh_topk")
    lsh.foreach { case (pair, s) => assert(bruteScores(pair) == s) }
    // 4 bands x 4 bits touch ~1-(15/16)^4 ≈ 23% of the corpus at random;
    // recall must beat that baseline on signal, with deterministic margin
    val recall = (exact & lsh.keySet).size.toDouble / exact.size
    assert(recall >= 0.30, s"recall $recall below sign-LSH expectation")
  }

  test("embedding near-dup: every reported pair is a true >=0.3 pair") {
    val pairs = queries("q24_embedding_neardup")(spark, dir)
      .select("vec_a", "vec_b", "score")
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    // verify against direct computation
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    val truth = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("s"))
      .filter(col("s") >= 0.3)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pairs.foreach { case (x, y, s) =>
      assert(truth((x, y)) == s, s"pair ($x,$y) not a true near-dup")
    }
    // recall above the random-bucket baseline (~23% of pairs share a band)
    assert(pairs.length.toDouble / truth.size >= 0.30)
  }

  test("IVF: neighbors come only from the routed partition, scores exact") {
    val ivf = result("q42_ivf_topk")
    ivf.foreach { case (pair, s) => assert(bruteScores(pair) == s) }
    val labels = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    // all neighbors of one query share a single label (nprobe = 1)
    ivf.keys.groupBy(_._1).foreach { case (_, pairs) =>
      assert(pairs.map(p => labels(p._2)).toSet.size == 1)
    }
    assert(ivf.nonEmpty)
  }

  test("q114 power iteration recovers a planted dominant direction") {
    import spark.implicits._
    // planted direction d (unit, first 4 dims) drowns isotropic noise:
    // x_i = s_i·d·3 + ε, ε small — the top eigenvector must align with d
    val rnd = new scala.util.Random(11)
    val dir0 = {
      val raw = Array(0.6, -0.5, 0.4, 0.48) ++ Array.fill(60)(0.0)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val rows = (0 until 300).map { i =>
      val s = if (rnd.nextBoolean()) 3.0 else -3.0
      val v = (0 until 64).map(j =>
        (s * dir0(j) + rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v, 0)
    }
    val pd = tmpDir("powiter")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(pd + "/embeddings.parquet")
    val out = graft.SparkEntry.queries("q114_top_component")(spark, pd)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val loading = out.map(_._2)
    val cos = loading.zip(dir0).map { case (a, b) => a * b }.sum /
      math.sqrt(loading.map(x => x * x).sum)
    assert(math.abs(cos) > 0.99, s"|cos(v, planted)| = ${math.abs(cos)}")
    // eigenvalue ≈ Σ s² ‖d‖² = 300·9 plus noise energy share
    val ev = out.head._3
    assert(ev > 2000 && ev < 3500, s"eigenvalue $ev")
  }

  test("q116 deflation recovers the SECOND planted direction, " +
      "orthogonal to the first") {
    import spark.implicits._
    // two orthogonal planted directions with separated energies:
    // d1 (dims 0-3) at amplitude 3, d2 (dims 8-11) at amplitude 1.5
    val rnd = new scala.util.Random(13)
    def unit(raw: Array[Double]) = {
      val n = math.sqrt(raw.map(x => x * x).sum); raw.map(_ / n)
    }
    val d1 = unit(Array(0.6, -0.5, 0.4, 0.48) ++ Array.fill(60)(0.0))
    val d2 = unit(Array.fill(8)(0.0) ++ Array(0.5, 0.5, -0.5, 0.5) ++
      Array.fill(52)(0.0))
    val rows = (0 until 300).map { i =>
      val s1 = if (rnd.nextBoolean()) 3.0 else -3.0
      val s2 = if (rnd.nextBoolean()) 1.5 else -1.5
      val v = (0 until 64).map(j =>
        (s1 * d1(j) + s2 * d2(j) + rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v, 0)
    }
    val pd = tmpDir("deflate")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(pd + "/embeddings.parquet")
    val first = graft.SparkEntry.queries("q114_top_component")(spark, pd)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val second = graft.SparkEntry.queries("q116_second_component")(spark, pd)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val v1 = first.map(_._2)
    val v2 = second.map(_._2)
    val cos2 = v2.zip(d2).map { case (a, b) => a * b }.sum /
      math.sqrt(v2.map(x => x * x).sum)
    assert(math.abs(cos2) > 0.99, s"|cos(v2, planted d2)| = ${math.abs(cos2)}")
    val ortho = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(ortho) < 0.02, s"|v1·v2| = ${math.abs(ortho)}")
    // deflated eigenvalue sits at the second energy scale, below the first
    assert(second.head._3 < first.head._3 * 0.5)
    assert(second.head._3 > 300 && second.head._3 < 1200,
      s"second eigenvalue ${second.head._3}")
  }

  test("q124 k-center == independent in-memory greedy; covering radius " +
      "non-increasing; selection is diverse (no duplicate picks)") {
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
      .sortBy(_._1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val sel = scala.collection.mutable.Buffer((1, vecs.head._1, 0.0))
    val cvs = scala.collection.mutable.Buffer(vecs.head._2)
    for (r <- 2 to 8) {
      val far = vecs
        .map { case (id, v) => (id, r6(cvs.map(c => d2(v, c)).min)) }
        .maxBy { case (id, md) => (md, -id) }
      sel += ((r, far._1, far._2))
      cvs += vecs.find(_._1 == far._1).get._2
    }

    val got = queries("q124_kcenter_coreset")(spark, dir)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == sel.toSeq)
    // greedy k-center's max-min distance is pointwise non-increasing
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a }, radii.toSeq)
    assert(got.map(_._2).distinct.length == 8, "picks must be distinct")
  }

  test("q127 JL projection: matches a plain-Scala replica and roughly " +
      "preserves norms (E‖Pv‖² = k‖v‖² for Rademacher signs)") {
    def sign(i: Int, j: Int): Double = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$i|$j")
      if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0) 1.0
      else -1.0
    }
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap

    val got = queries("q127_random_projection")(spark, dir)
      .as[(Long, Int, Double)].collect()
    assert(got.length == vecs.size * 16)
    got.foreach { case (id, pos, coord) =>
      val v = vecs(id)
      val expected = {
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * sign(i + 1, pos); i += 1 }
        math.rint(s * 1e6) / 1e6
      }
      assert(coord == expected, s"vec $id pos $pos")
    }

    // JL sanity: per-vector ‖Pv‖²/(16·‖v‖²) concentrates near 1, so the
    // projected space is usable as a cheap distance filter
    val ratios = got.groupBy(_._1).map { case (id, rows) =>
      val p2 = rows.map(r => r._3 * r._3).sum
      val v2 = vecs(id).map(x => x * x).sum
      p2 / (16.0 * v2)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
  }

  test("q140 embedding decon == in-memory brute force (argmax tie rule)") {
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val hold = vecs.filter(_._1 % 29 == 0)
    val corp = vecs.filter(_._1 % 29 != 0)
    assert(hold.nonEmpty && corp.nonEmpty)
    // sequential left-to-right double fold — the DotProduct order
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val expected = corp.map { case (cid, cv) =>
      val scored = hold.map { case (hid, hv) =>
        (r6(dot(cv, hv) / (math.sqrt(dot(cv, cv)) * math.sqrt(dot(hv, hv)))),
          hid)
      }
      val maxCos = scored.map(_._1).max
      // ties on the rounded score break to the SMALLEST holdout id
      val nearest = scored.filter(_._1 == maxCos).map(_._2).min
      val nNear = scored.count(_._1 >= 0.4).toLong
      cid -> ((nearest, maxCos, nNear, nNear > 0))
    }.toMap

    val got = queries("q140_embedding_decon")(spark, dir)
      .select("vec_id", "nearest_holdout", "max_cos", "n_near", "contaminated")
      .as[(Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected)
    assert(got.size == corp.length)
  }
}
