package graft.streaming

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Read-priced DSIR weights == a from-scratch batch-q102 recompute over
  * the corpus's CURRENT images after every batch — including the
  * ledger moves a language flip and a delete must make — and replay is
  * a no-op. */
class StreamingDsirSpec extends SparkSuite {
  import spark.implicits._

  private val B = 64 // narrow hash width so bucket collisions are exercised

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType),
    StructField("lang", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(op: String, id: String, text: String, lang: String) = {
    seqNo += 1
    val after =
      if (op == "d") "null"
      else s"""{"doc_id":"$id","text":"$text","lang":"$lang"}"""
    val before =
      if (op == "c") "null"
      else s"""{"doc_id":"$id","text":"-","lang":"-"}"""
    ("documents",
      s"""{"before":$before,"after":$after,"op":"$op","ts_ms":$seqNo}""",
      seqNo)
  }

  // in-memory replica of batch q102 at hash width B over current images
  private def bucket(g: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % B
  }
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  private def expectedOf(current: Map[String, (String, String)])
      : Map[String, Double] = {
    val docCnt: Map[(String, Long), Long] = current.toSeq
      .flatMap { case (id, (text, _)) =>
        val w = text.trim.split("\\s+").filter(_.nonEmpty)
        w.iterator.zip(w.iterator.drop(1))
          .map { case (a, b) => (id, bucket(a + " " + b)) }.toSeq
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rf = docCnt.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val tf = docCnt.filter { case ((id, _), _) => current(id)._2 == "en" }
      .groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val (rn, tn) = (rf.values.sum, tf.values.sum)
    val lam = rf.map { case (b, rc) =>
      b -> r6(math.log((tf.getOrElse(b, 0L) + 1.0) / (tn + B.toDouble)) -
        math.log((rc + 1.0) / (rn + B.toDouble)))
    }
    docCnt.toSeq.map { case ((id, b), c) => id -> (lam(b) * c) }
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum.toDouble }
  }

  test("score tracks creates, re-texts, language flips and deletes") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdsir")
    val dsir = StreamingDsir.weights(spark, stateDir, buckets = B)
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(dsir.view))

    val current = scala.collection.mutable.Map.empty[String, (String, String)]
    var batchNo = 0L
    def step(recs: ((String, String, Long), (String, (String, String)))*)
        : Unit = {
      recs.foreach { case (_, (id, v)) =>
        if (v == null) current.remove(id) else current(id) = v
      }
      pipeline.processBatch(
        recs.map(_._1).toDF("table", "value", "seq"), Some(batchNo))
      batchNo += 1
      val got = dsir.score().as[(String, Double)].collect().toMap
      assert(got == expectedOf(current.toMap),
        s"batch ${batchNo - 1}: score != batch recompute")
    }
    def c(id: String, text: String, lang: String) =
      (rec("c", id, text, lang), (id, (text, lang)))
    def u(id: String, text: String, lang: String) =
      (rec("u", id, text, lang), (id, (text, lang)))
    def d(id: String) =
      (rec("d", id, null, null), (id, null: (String, String)))

    step(c("e1", "the cat sat on the mat", "en"),
      c("f1", "le chat est sur le tapis", "fr"))
    step(c("e2", "the cat ate the fish", "en"))
    // re-text: counts move buckets
    step(u("f1", "le chien mange le poisson maintenant", "fr"))
    // language FLIP without text change: target ledger moves, raw stays
    step(u("f1", "le chien mange le poisson maintenant", "en"))
    // flip back and delete a target doc
    step(u("f1", "le chien mange le poisson maintenant", "fr"), d("e1"))
    // short doc: no bigrams, absent from score
    step(c("s1", "solo", "en"))
    assert(!dsir.score().as[(String, Double)].collect().toMap.contains("s1"))
    step(d("e2"), d("f1"), d("s1"))
    assert(dsir.score().isEmpty)
  }

  test("replayed batch leaves ledgers, doc state and score unchanged") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdsir-replay")
    val dsir = StreamingDsir.weights(spark, stateDir, buckets = B)
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(dsir.view))

    pipeline.processBatch(
      Seq(rec("c", "r1", "alpha beta gamma delta", "en"))
        .toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(rec("u", "r1", "alpha beta epsilon", "fr"),
      rec("c", "r2", "beta gamma beta gamma", "en"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = dsir.score().as[(String, Double)].collect().toMap
    pipeline.processBatch(b1, Some(1L)) // redelivery
    assert(dsir.score().as[(String, Double)].collect().toMap == after)
  }
}
