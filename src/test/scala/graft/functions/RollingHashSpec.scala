package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins [[RollingHash]] value-identical to the declarative
  * transform/slice/aggregate fold it replaced (q33's fingerprint — the
  * DuckDB oracle computes the same fold, so equality here carries the
  * oracle). */
class RollingHashSpec extends SparkSuite {
  import spark.implicits._

  private val P = 1000000007L

  /** The round-2 declarative form, verbatim from TextAnalysis. */
  private def declarative(text: org.apache.spark.sql.Column) = {
    val w = split(trim(text), "\\s+")
    val hw = transform(w, x =>
      pmod(conv(substring(md5(x), 1, 8), 16, 10).cast("long"), lit(P)))
    aggregate(
      slice(hw, lit(2), greatest(size(hw) - 1, lit(0))),
      element_at(hw, 1),
      (acc, x) => pmod(acc * 31 + x, lit(P)))
  }

  test("matches the declarative fold on the real documents corpus") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val out = docs.select(
      RollingHash(col("text")).as("fast"),
      declarative(col("text")).as("slow"))
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("edge cases: single word, repeated whitespace, unicode") {
    val df = Seq("hello", "  a   b\t c  ", "héllo wörld", "x y z x y z")
      .toDF("text")
    val out = df.select(
      RollingHash(col("text")).as("fast"),
      declarative(col("text")).as("slow"))
      .as[(Long, Long)].collect()
    out.foreach { case (fast, slow) => assert(fast == slow) }
    // values stay in [0, P)
    out.foreach { case (fast, _) => assert(fast >= 0L && fast < P) }
  }

  test("null text yields null") {
    val df = Seq(Some("a b"), None).toDF("text")
    val out = df.select(RollingHash(col("text")).as("h"))
      .as[Option[Long]].collect()
    assert(out(0).nonEmpty && out(1).isEmpty)
  }

  test("rejects non-string input at analysis") {
    val df = Seq(1L).toDF("x")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(RollingHash(col("x"))).collect()
    }
  }
}
