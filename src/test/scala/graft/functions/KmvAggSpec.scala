package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[KmvAgg]] vs the obvious specification: bottom-k == sorted distinct
  * take k, regardless of duplicates, input order, or partitioning — the
  * properties the binary-search insert and the size-prefixed merge must
  * preserve. */
class KmvAggSpec extends SparkSuite {
  import spark.implicits._

  private def bottomK(values: Seq[Long], k: Int,
      partitions: Int): Seq[Long] =
    spark.sparkContext.parallelize(values, partitions).toDF("v")
      .agg(KmvAgg.bottomK(col("v"), k).as("sk"))
      .as[Seq[Long]].head()

  test("bottom-k == sorted distinct take k, with duplicates and shuffles") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 400
      // small value range forces heavy duplication
      val vs = Seq.fill(n)(rnd.nextInt(n / 2 + 10).toLong - 17)
      val expect = vs.distinct.sorted.take(64)
      assert(bottomK(vs, 64, partitions = 1 + trial) == expect,
        s"trial $trial")
    }
  }

  test("fewer distinct values than k yields the exact distinct set") {
    assert(bottomK(Seq(5L, 3L, 5L, 3L, 9L), 64, 3) == Seq(3L, 5L, 9L))
  }

  test("per-group sketches: map-side partials merge to the global answer") {
    val rows = (0 until 3000).map(i => (s"s${i % 3}", (i * 7919L) % 257))
    val got = rows.toDF("source", "v").repartition(8)
      .groupBy("source").agg(KmvAgg.bottomK(col("v"), 16).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    val expect = rows.groupBy(_._1).map { case (s, vs) =>
      s -> vs.map(_._2).distinct.sorted.take(16)
    }
    assert(got == expect)
  }

  test("nulls are ignored, empty input yields an empty sketch") {
    val got = Seq[Option[Long]](None, Some(4L), None)
      .toDF("v")
      .agg(KmvAgg.bottomK(col("v"), 8).as("sk"))
      .as[Seq[Long]].head()
    assert(got == Seq(4L))
    val empty = Seq.empty[Long].toDF("v")
      .agg(KmvAgg.bottomK(col("v"), 8).as("sk"))
      .as[Seq[Long]].head()
    assert(empty == Seq.empty)
  }
}
