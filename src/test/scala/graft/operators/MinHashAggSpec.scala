package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the single-buffer imperative [[graft.functions.MinHashAgg]]
  * signature VALUE-IDENTICAL to the round-2 declarative 64-column
  * `min(pmod(h0*a+b, P))` form, on real shingle data — the q21/q23/q36
  * pair sets depend on exact signature equality (band hashes are
  * xxhash64 over the m-columns, so a single differing long changes
  * buckets). */
class MinHashAggSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def exploded = graft.sources.Tables.load(spark, dir, "documents")
    .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("f"))

  test("imperative signature equals the declarative 64-column form") {
    val fast = Dedup.minhashSignature(exploded, "f")
    val slow = Dedup.minhashSignatureDeclarative(exploded, "f")
    assert(fast.columns.toSeq == slow.columns.toSeq)
    // exact anti-join both ways: any differing (doc_id, m0..m63) row fails
    val cols = fast.columns.toSeq
    assert(fast.join(slow, cols, "left_anti").isEmpty &&
      slow.join(fast, cols, "left_anti").isEmpty,
      "signatures must match the declarative form row-for-row")
    assert(fast.count() > 0)
  }

  test("partial-aggregate merge path: repartitioned input, same signature") {
    // many small partitions force real partial/final merge() calls
    val fast = Dedup.minhashSignature(exploded.repartition(16), "f")
    val slow = Dedup.minhashSignatureDeclarative(exploded, "f")
    assert(fast.join(slow, fast.columns.toSeq, "left_anti").isEmpty)
  }

  test("null features: same treatment as the declarative form") {
    // xxhash64(null) is the seed constant (not null), so a null feature
    // contributes the SAME constant hash in both forms — equality, not
    // skipping, is the contract (exploded shingle frames never carry
    // nulls anyway; explode drops them)
    val df = Seq((1L, Some("a")), (1L, None), (2L, None))
      .toDF("doc_id", "f")
    val fast = Dedup.minhashSignature(df, "f")
    val slow = Dedup.minhashSignatureDeclarative(df, "f")
    assert(fast.join(slow, fast.columns.toSeq, "left_anti").isEmpty &&
      slow.join(fast, fast.columns.toSeq, "left_anti").isEmpty)
  }
}
