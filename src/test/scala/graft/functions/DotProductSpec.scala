package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DotProductSpec extends SparkSuite {
  import spark.implicits._

  test("matches the declarative aggregate/zip_with form bit-for-bit") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f), Seq(0.3f, 0.7f)),
      (Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val out = df.select(
      DotProduct(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("slow"))
      .as[(Double, Double)].collect()
    out.foreach { case (fast, slow) => assert(fast == slow) }
    assert(out(0)._1 == 32.0)
    assert(out(2)._1 == 0.0)
  }

  test("double arrays and null propagation") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(DotProduct(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect()
    assert(out(0).contains(11.0))
    assert(out(1).isEmpty)
  }

  test("mismatched lengths yield null, matching the declarative form") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f)),
      (Seq(1.0f), Seq(2.0f))).toDF("a", "b")
    val out = df.select(
      DotProduct(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("slow"))
      .as[(Option[Double], Option[Double])].collect()
    assert(out(0) == ((None, None)), "mismatch must be null in BOTH forms")
    assert(out(1) == ((Some(2.0), Some(2.0))))
  }

  test("rejects non-numeric-array inputs at analysis") {
    val df = Seq(("x", Seq(1.0f))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(DotProduct(col("a"), col("b"))).collect()
    }
  }
}
