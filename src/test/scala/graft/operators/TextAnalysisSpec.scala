package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("occurrences: non-overlapping replace-count semantics") {
    val out = Seq(
      ("x the y the z", " the "),   // 2 padded occurrences
      ("the the the", " the "),     // adjacent: left-to-right consumes shared spaces
      ("nothing here", " the "))
      .toDF("text", "w")
      .select(TextAnalysis.occurrences(
        concat(lit(" "), col("text"), lit(" ")), " the ").as("n"))
      .as[Long].collect()
    assert(out(0) == 2)
    assert(out(1) == 2) // " the the the " -> first+third (middle lost its space)
    assert(out(2) == 0)
  }

  test("fingerprint is order-sensitive, equal for equal word sequences") {
    val queries = graft.SparkEntry.queries
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    df.createOrReplaceTempView("fp_docs")
    val w = split(trim(col("text")), "\\s+")
    val hw = transform(w, x =>
      pmod(conv(substring(md5(x), 1, 8), 16, 10).cast("long"),
        lit(1000000007L)))
    val fp = df.select(col("doc_id"), aggregate(
      slice(hw, lit(2), greatest(size(hw) - 1, lit(0))),
      element_at(hw, 1),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L))).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("lang-id: marker words dominate; ties resolve en-first; cjk by codepoints") {
    // run the production query over a scratch parquet dir shaped like
    // the documents table
    val docs = Seq(
      (1L, "der hund und die katze und der vogel"),
      (2L, "le chat et la maison et le chien"),
      (3L, "el gato y los perros que corren"),
      (4L, "the cat sat on a mat of straw"),
      (5L, "没有 任何 西方 词汇 在 这里"),
      (6L, "xyzzy plugh")).toDF("doc_id", "text")
      .withColumn("lang", lit("??")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("langid")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("q31_lang_id")(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "en",
      5L -> "zh", 6L -> "unknown"))
  }
}
