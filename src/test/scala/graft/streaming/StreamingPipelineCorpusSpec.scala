package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Composed streaming pipeline == batch q115 recompute at every step of
  * a replayed document changelog: after each micro-batch the sink must
  * hold exactly the per-source top-k (with PII signature) of the docs
  * surviving Gopher admission ∧ train split ∧ exact dedup ∧ near-dup
  * survivor selection ∧ decontamination over the CURRENT state —
  * including contamination flipping for a doc the batch never touched,
  * survivor hand-off on delete, cap eviction, and idempotent replay. */
class StreamingPipelineCorpusSpec extends SparkSuite {
  import spark.implicits._

  private val capN = 2

  private val docSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType),
    StructField("source", StringType)))
  private val sources =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  private def img(id: String, text: String, src: String) =
    s"""{"doc_id":"$id","text":"$text","source":"$src"}"""
  private def create(id: String, text: String, src: String) =
    rec(s"""{"before":null,"after":${img(id, text, src)},"op":"c","ts_ms":$seqNo}""")
  private def update(id: String, o: String, n: String, src: String) =
    rec(s"""{"before":${img(id, o, src)},"after":${img(id, n, src)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, text: String, src: String) =
    rec(s"""{"before":${img(id, text, src)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** The q34/q115 content-hash split bucket, computed driver-side so
    * the fixtures can be PLACED in train (< 90) or holdout (≥ 90). */
  private def bucketOf(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 100
  }

  /** A Gopher-passing text (≥50 alpha tokens, 3 stopwords, word length
    * in range) with `n` filler tokens of the given prefix, suffix-tuned
    * until its split bucket satisfies `want`. */
  private def mkText(prefix: String, n: Int, want: Long => Boolean): String = {
    def base(salt: Int): String = {
      val w = (0 until n).map(i => s"$prefix$i")
      (Seq("the", "a", "of") ++ w :+ s"zz$salt").mkString(" ")
    }
    Iterator.from(0).map(base).find(t => want(bucketOf(t))).get
  }
  private def train(prefix: String, n: Int = 56): String =
    mkText(prefix, n, _ < 90)

  /** Batch q115 recompute (string keys) over the materialized state;
    * `bestQuality = true` swaps in q153's argmax survivor rule at the
    * near-dup stage (numeric-id tie-break — the policy's documented
    * contract). */
  private def batchRecompute(state: DataFrame,
      bestQuality: Boolean = false)
      : Set[(String, String, Double, Long, String)] = {
    val docs = state.select(col("doc_id"), col("text"), col("source"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucket = pmod(
      conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"),
      lit(100L))
    val gate = TextAnalysis.gopherRules(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .filter(col("keep")).select("doc_id")
    val sigs = docs.select(col("doc_id"), md5(col("text")).as("sig"))
    val exactLosers = sigs
      .join(sigs.groupBy("sig").agg(min("doc_id").as("keep_id")), "sig")
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
    val exploded = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"))).as("f"))
    val pairs = Dedup.nearDupPairs(exploded, 0.8, bandRows = 2, nBands = 32)
      .select("doc_a", "doc_b")
    val clusters = Dedup.clusterPairsStar(pairs)
    val nearLosers =
      if (!bestQuality)
        clusters.filter(col("doc_id") =!= col("cluster_id"))
          .select("doc_id")
      else {
        val q = docs.select(col("doc_id").as("m_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        val surv = clusters.join(q, clusters("doc_id") === q("m_id"))
          .groupBy("cluster_id")
          .agg(max(struct(col("quality").as("q"),
            (-col("m_id").cast("long")).as("negid"))).as("m"))
          .select(col("cluster_id"),
            (-col("m.negid")).cast("string").as("sid"))
        clusters.join(surv, "cluster_id")
          .filter(col("doc_id") =!= col("sid")).select("doc_id")
      }
    val grams = docs.select(col("doc_id"), bucket.as("b"),
      explode(graft.functions.NGrams.wordShingles(col("text"), 5)).as("g"))
    val hold = grams.filter(col("b") >= 90).select("g").distinct()
    val contaminated = grams.join(hold, "g").select("doc_id").distinct()
    val surv = docs.filter(bucket < 90)
      .join(gate, Seq("doc_id"), "left_semi")
      .join(exactLosers, Seq("doc_id"), "left_anti")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("source"), col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val out = surv.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= capN)
      .join(docs.select(col("doc_id"),
        md5(Curation.piiRedact(col("text"))).as("clean_sig")), "doc_id")
      .select(col("source"), col("doc_id"), col("quality"),
        col("rk").cast("long").as("rk"), col("clean_sig"))
      .as[(String, String, Double, Long, String)].collect().toSet
    docs.unpersist()
    out
  }

  private def sinkRows(sink: InMemoryUpsertSink)
      : Set[(String, String, Double, Long, String)] =
    sink.docs("pipeline_corpus").values.map { d =>
      (d("source").toString, d("doc_id").toString,
        d("quality").asInstanceOf[Double], d("rk").asInstanceOf[Long],
        d("clean_sig").toString)
    }.toSet

  // fixtures: tA/tB/tC in source s1 (tB = near-dup of tA), tD in s2;
  // hX is a HOLDOUT doc sharing tD's text (so its 5-grams) — created
  // later to flip tD's contamination without touching tD
  private val textA = train("aa")
  private val textA2 = { // near-dup of textA: one filler word swapped
    val w = textA.split(" ")
    (w.slice(0, 30) ++ Array("swapped") ++ w.slice(31, w.length))
      .mkString(" ")
  }
  private val textB = train("bb", n = 66) // more tokens → higher quality
  private val textC = train("cc", n = 76)
  private val textD = train("dd")
  private val textH = { // HOLDOUT text containing a 5-gram run of textD
    val run = textD.split(" ").slice(10, 20).mkString(" ")
    val filler = (0 until 46).map(i => s"hh$i").mkString(" ")
    Iterator.from(0).map(i => s"the a of $filler $run hz$i")
      .find(t => bucketOf(t) >= 90).get
  }
  private val shortT = (0 until 20).map(i => s"sh$i").mkString(" ")

  test("composed pipeline equals batch q115 recompute after every batch") {
    // textA2 must actually near-dup textA at the batch threshold, and
    // textH must be holdout and share a 5-gram with train textD
    assert(bucketOf(textA) < 90 && bucketOf(textA2) < 90)
    assert(bucketOf(textH) >= 90 && bucketOf(textD) < 90)

    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("spipeline")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingPipelineCorpus.pipelineView(spark, stateDir,
        capN = capN)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")),
        s"batch $batchId: incremental != batch q115 recompute")
    }

    // creates: near-dup pair (tB loses to tA by id), an exact duplicate
    // (tAx loses to tA), a Gopher-failing short doc, two more sources
    step(0, create("tA", textA, "s1"), create("tB", textA2, "s1"),
      create("tAx", textA, "s1"), create("sh", shortT, "s1"),
      create("tD", textD, "s2"))
    val r0 = sinkRows(sink)
    assert(r0.map(_._2).contains("tA") && r0.map(_._2).contains("tD"))
    assert(!r0.map(_._2).contains("tB") && !r0.map(_._2).contains("tAx")
      && !r0.map(_._2).contains("sh"))

    // a HOLDOUT doc arrives sharing a 5-gram with tD: tD (untouched
    // this batch) must drop as contaminated — the transition frontier
    step(1, create("hX", textH, "s9"))
    assert(!sinkRows(sink).map(_._2).contains("tD"))

    // the holdout doc leaves: tD's grams transition back → re-admitted
    step(2, delete("hX", textH, "s9"))
    assert(sinkRows(sink).map(_._2).contains("tD"))

    // survivor hand-off: deleting tA promotes tB (near-dup cluster
    // loses its survivor) AND the exact group collapses — but tAx holds
    // tA's exact text and near-dups textA2 = tB, so the cluster keeps
    // exactly one survivor; the recompute pin decides which
    step(3, delete("tA", textA, "s1"))

    // cap eviction: s1 fills past capN with ever-higher quality docs;
    // rank rows beyond capN must vanish and order must match batch
    step(4, create("tE", textB, "s1"), create("tF", textC, "s1"))
    val r4 = sinkRows(sink)
    assert(r4.count(_._1 == "s1") == capN)

    // degradation: the top doc leaves; the displaced rank re-fills
    step(5, delete("tF", textC, "s1"))
    assert(sinkRows(sink).count(_._1 == "s1") == capN)
  }

  test("BestQuality policy: composed sink == batch q115-with-argmax " +
      "recompute; the better rendering survives and a quality edit " +
      "flips the survivor") {
    // a near-dup of textA with one filler swapped for a 4th stopword:
    // HIGHER quality than textA, id chosen HIGHER, bucket tuned train
    val textAhq = (30 until 50).iterator.map { i =>
      val w = textA.split(" "); w(i) = "the"; w.mkString(" ")
    }.find(t => bucketOf(t) < 90).get

    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("spipeline-q153")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingPipelineCorpus.pipelineView(spark, stateDir,
        capN = capN,
        policy = StreamingCuration.SurvivorPolicy.BestQuality)))

    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(sinkRows(sink) ==
        batchRecompute(pipeline.state("documents"), bestQuality = true),
        s"batch $batchId: incremental != argmax-q115 recompute")
    }

    // numeric ids (the policy's tie-break contract): the HIGHER-quality
    // near-dup has the HIGHER id — min-id would keep 101, argmax keeps 102
    step(0, create("101", textA, "s1"), create("102", textAhq, "s1"),
      create("201", textD, "s2"))
    val ids0 = sinkRows(sink).map(_._2)
    assert(ids0.contains("102") && !ids0.contains("101"),
      "argmax survivor must beat min-id in the composed pipeline")

    // a pure quality edit on the survivor (same cluster, quality drops
    // to 101's level) flips survivorship to the lower id
    step(1, update("102", textAhq, textA2, "s1"))
    val ids1 = sinkRows(sink).map(_._2)
    assert(ids1.contains("101") && !ids1.contains("102"),
      "quality-edit CDC event must flip the composed survivor")

    // replay idempotence on the widened-frontier path
    val b1 = Seq(update("102", textAhq, textA2, "s1"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) ==
      batchRecompute(pipeline.state("documents"), bestQuality = true))
  }

  test("property: random changelogs keep the sink == batch q115 at " +
      "every micro-batch") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // texts long enough to pass the Gopher length gate, drawn from a
    // small pool so near-dup clusters, split moves, shared 5-grams and
    // quality shifts all occur by construction
    val pool = Vector("data", "vector", "window", "alpha", "beta",
      "gamma", "delta", "epsilon", "filler", "plain", "the", "a", "of")
    case class Op(op: String, id: String, text: String, src: String)
    val genOp: Gen[Op] = for {
      op <- Gen.frequency(5 -> "c", 3 -> "u", 2 -> "d")
      id <- Gen.oneOf("d1", "d2", "d3", "d4", "d5", "d6")
      n <- Gen.choose(52, 60)
      ws <- Gen.listOfN(n, Gen.oneOf(pool))
      src <- Gen.oneOf("s1", "s2")
    } yield Op(op, id, ws.mkString(" "), src)
    def envelope(o: Op, seq: Long): (String, String, Long) = {
      val i = img(o.id, o.text, o.src)
      val b = if (o.op == "c") "null" else i
      val a = if (o.op == "d") "null" else i
      ("documents",
        s"""{"before":$b,"after":$a,"op":"${o.op}","ts_ms":$seq}""", seq)
    }

    var seed = Seed(7L)
    (1 to 2).foreach { trial =>
      val ops = Gen.listOfN(12, genOp)
        .pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val sink = new InMemoryUpsertSink
      val stateDir = tmpDir(s"spipeline-prop-$trial")
      val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
        Seq(StreamingPipelineCorpus.pipelineView(spark, stateDir,
          capN = capN)))
      val records = ops.zipWithIndex.map { case (o, i) =>
        envelope(o, i.toLong)
      }
      records.grouped(math.max(records.size / 3, 1)).zipWithIndex
        .foreach { case (b, i) =>
          pipeline.processBatch(b.toDF("table", "value", "seq"),
            Some(i.toLong))
          assert(
            sinkRows(sink) == batchRecompute(pipeline.state("documents")),
            s"trial $trial batch $i ops=$ops")
        }
    }
  }

  test("replayed batch is idempotent across all eight state tables") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("spipeline-replay")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingPipelineCorpus.pipelineView(spark, stateDir,
        capN = capN)))

    pipeline.processBatch(Seq(create("tA", textA, "s1"),
      create("tD", textD, "s2")).toDF("table", "value", "seq"), Some(0L))
    val b1 = Seq(create("tB", textA2, "s1"), create("hX", textH, "s9"))
      .toDF("table", "value", "seq")
    pipeline.processBatch(b1, Some(1L))
    val after = sinkRows(sink)
    assert(after == batchRecompute(pipeline.state("documents")))

    pipeline.processBatch(b1, Some(1L))
    assert(sinkRows(sink) == after)
    assert(sinkRows(sink) == batchRecompute(pipeline.state("documents")))
  }
}
