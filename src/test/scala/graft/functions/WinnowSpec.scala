package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[WinnowedFingerprints]] against an independent in-memory reference,
  * the paper's detection guarantee, and q105's df-cap behavior. */
class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // independent recompute of the expression contract
  private def ref(text: String, k: Int, w: Int): Set[Long] = {
    val cps = text.codePoints().toArray
    if (cps.length < k) return Set.empty
    val hs = (0 to cps.length - k).map { i =>
      java.lang.Long.parseLong(md5hex(new String(cps, i, k)).take(8), 16)
    }
    (0 until math.max(hs.length - w + 1, 1))
      .map(p => hs.slice(p, math.min(p + w, hs.length)).min).toSet
  }

  test("expression == in-memory reference on the real corpus and CJK text") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"))
      // the synthetic corpus is ASCII; plant multi-byte text so the
      // codepoint-indexing contract (DuckDB substr semantics) is hit
      .unionByName(Seq(
        (90001L, "中文的文本指纹测试内容，带标点。and mixed ascii too"),
        (90002L, "emoji 😀😀 inside 😀 a document with text around it"))
        .toDF("doc_id", "text"))
    val got = docs
      .select(col("doc_id"), col("text"),
        Winnow.fingerprints(col("text"), 8, 4).as("fp"))
      .as[(Long, String, Seq[Long])].collect()
    got.foreach { case (id, text, fp) =>
      assert(fp.toSet == ref(text, 8, 4), s"doc $id fingerprints diverge")
      assert(fp.distinct == fp, s"doc $id emits duplicate fingerprints")
    }
  }

  test("guarantee: a shared verbatim run of ≥ w+k−1 chars shares a fingerprint") {
    val shared = "QUOTEDRUN11" // 11 chars = w+k-1 for k=8, w=4
    val a = s"left context text $shared and unrelated tail alpha"
    val b = s"completely different framing $shared with other words"
    assert((ref(a, 8, 4) & ref(b, 8, 4)).nonEmpty)
  }

  test("edges: shorter than k empty; k..k+w-2 hashes collapse to one min") {
    val out = Seq("1234567", "12345678", "123456789")
      .toDF("text")
      .select(Winnow.fingerprints(col("text"), 8, 4).as("fp"))
      .as[Seq[Long]].collect()
    assert(out(0).isEmpty)                       // 7 chars < k
    assert(out(1).size == 1)                     // exactly one 8-gram
    assert(out(2).size == 1 &&                   // 2 hashes, 1 window
      out(2).head == Seq("12345678", "23456789").map(g =>
        java.lang.Long.parseLong(md5hex(g).take(8), 16)).min)
  }

  test("q105: heavy-overlap pair found; df-capped boilerplate pairs are not") {
    // 12 docs all carrying the same boilerplate banner (df 12 > cap 10
    // kills its fingerprints) plus unique filler; docs 100/101 share a
    // long unique paragraph — the only pair that may survive
    val banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY FOR MORE CONTENT"
    val para = "the quick brown fox jumped over seventeen lazy dogs while " +
      "carrying a surprisingly heavy basket of winnowed fingerprints"
    val rnd = new scala.util.Random(3)
    def filler() = Seq.fill(12)(rnd.alphanumeric.take(9).mkString).mkString(" ")
    val docs = (0 until 12).map(i => (i.toLong, s"$banner ${filler()}")) ++
      Seq((100L, s"$para ${filler()}"), (101L, s"${filler()} $para"))
    val pd = tmpDir("winnow")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(pd + "/documents.parquet")
    val pairs = graft.SparkEntry.queries("q105_winnow_dup")(spark, pd)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((100L, 101L)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 5)
  }
}
