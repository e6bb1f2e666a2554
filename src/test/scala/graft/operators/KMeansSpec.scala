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
}
