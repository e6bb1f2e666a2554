package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The injected SQL names resolve and agree with the Column API
  * ([[graft.GraftExtensions]]). */
class SqlFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("rolling_hash / word_shingles / char_grams resolve in spark.sql") {
    Seq(("a b c a b c", Seq(1.0, 2.0)), ("x y", Seq(0.5, -1.0)))
      .toDF("text", "v").createOrReplaceTempView("sqlfn_t")

    val viaSql = spark.sql(
      """SELECT rolling_hash(text) AS fp,
        |       word_shingles(text, 2) AS ws,
        |       word_grams(text, 2) AS wg,
        |       char_grams(text, 3) AS cg,
        |       winnowed_fingerprints(text, 3, 2) AS wf,
        |       dot_product(v, v) AS dp
        |FROM sqlfn_t""".stripMargin)
      .as[(Long, Seq[String], Seq[String], Seq[String], Seq[Long], Double)]
      .collect().toSet

    val viaCols = spark.table("sqlfn_t").select(
      RollingHash(col("text")).as("fp"),
      NGrams.wordShingles(col("text"), 2).as("ws"),
      NGrams.wordGrams(col("text"), 2).as("wg"),
      NGrams.charGrams(col("text"), 3).as("cg"),
      Winnow.fingerprints(col("text"), 3, 2).as("wf"),
      DotProduct(col("v"), col("v")).as("dp"))
      .as[(Long, Seq[String], Seq[String], Seq[String], Seq[Long], Double)]
      .collect().toSet

    assert(viaSql == viaCols)
    assert(viaSql.exists(_._2 == Seq("a b", "b c", "c a")))
    assert(viaSql.exists(_._3 == Seq("a b", "b c", "c a", "a b", "b c")))
  }

  test("pii_redact / quality_score resolve in spark.sql and agree " +
      "with the Column API") {
    Seq("mail bob@x.co or 555-0101 from 10.0.0.1",
      "the quick a fox of note with no pii at all")
      .toDF("text").createOrReplaceTempView("sqlfn_pii")

    val viaSql = spark.sql(
      """SELECT pii_redact(text) AS clean,
        |       quality_score(text) AS q
        |FROM sqlfn_pii""".stripMargin)
      .as[(String, Double)].collect().toSet
    val viaCols = spark.table("sqlfn_pii").select(
      graft.operators.Curation.piiRedact(col("text")).as("clean"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toSet

    assert(viaSql == viaCols)
    assert(viaSql.exists(_._1 == "mail <EMAIL> or <PHONE> from <IP>"))
  }

  test("gopher_keep resolves in spark.sql and equals q107's keep " +
      "column row for row") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, gopher_keep(text) AS keep FROM sqlfn_docs")
      .as[(Long, Boolean)].collect().toMap
    val viaQuery = graft.SparkEntry.queries("q107_gopher_rules")(spark, dir)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(viaSql == viaQuery)
    assert(viaSql.values.exists(identity) && viaSql.values.exists(!_))
  }

  test("non-literal n is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, length(text)) FROM sqlfn_t")
        .collect()
    }
    assert(e.getMessage.contains("literal integer"))
  }
}
