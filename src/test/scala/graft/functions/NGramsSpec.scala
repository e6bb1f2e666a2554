package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[WordGrams]] (all occurrences, in order) against the declarative
  * zip_with chain it replaces — must agree element-for-element on the
  * real corpus and on the edge shapes. */
class NGramsSpec extends SparkSuite {
  import spark.implicits._

  test("word_grams matches the declarative zip_with chain on the corpus") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    val w = split(trim(col("text")), "\\s+")
    val m = greatest(size(w) - 1, lit(0))
    val declarative = docs.select(col("doc_id"),
      zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
        (a, b) => concat(a, lit(" "), b)).as("g"))
    val native = docs.select(col("doc_id"),
      NGrams.wordGrams(col("text"), 2).as("g"))
    assert(native.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(native).isEmpty)
  }

  test("word_grams edges: occurrences kept, short and empty inputs") {
    val out = Seq("a b a b a", "one", "", "  padded  words  ")
      .toDF("text")
      .select(NGrams.wordGrams(col("text"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b a", "a b", "b a")) // duplicates KEPT
    assert(out(1) == Nil && out(2) == Nil)
    assert(out(3) == Seq("padded words"))
  }
}
