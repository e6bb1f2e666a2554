package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the provenance tier: q143's parse against an independent Scala
  * longest-match replica over the same rule list, q144 against the
  * declarative row_number form (the window the bounded aggregate
  * exists to avoid), and q145's rollup against q106's corpus-wide
  * totals (same pair table, different key — the totals must agree). */
class ProvenanceSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def queries = graft.SparkEntry.queries

  /** Independent replica of the FULL publicsuffix.org algorithm over
    * the same rule list: exception prevails (suffix = rule minus its
    * leftmost label), else longest plain-or-wildcard match (`*` =
    * exactly one label), else the PSL default rule. */
  private def refParse(host: String): (Option[String], Option[String]) = {
    val all = Provenance.suffixRules.map(_.toLowerCase)
    val plain = all.filterNot(r => r.startsWith("!") || r.startsWith("*.")).toSet
    val wild = all.filter(_.startsWith("*.")).map(_.substring(2)).toSet
    val exc = all.filter(_.startsWith("!")).map(_.substring(1)).toSet
    val labels = host.toLowerCase.split("\\.", -1)
    if (labels.exists(_.isEmpty)) return (None, None)
    def at(i: Int) = labels.drop(i).mkString(".")
    (0 until labels.length).find(i => exc.contains(at(i))) match {
      case Some(i) => (Some(at(i)), Some(at(i + 1)))
      case None =>
        (0 until labels.length).find(i => plain.contains(at(i)) ||
          (i + 1 < labels.length && wild.contains(at(i + 1)))) match {
          case Some(0) => (None, Some(host.toLowerCase))
          case Some(i) => (Some(at(i - 1)), Some(at(i)))
          case None if labels.length >= 2 =>
            (Some(labels.takeRight(2).mkString(".")), Some(labels.last))
          case None => (None, Some(host.toLowerCase))
        }
    }
  }

  test("q143 == independent parse replica over every corpus host; the " +
      "synthesized corpus covers all four suffix classes") {
    val got = queries("q143_registered_domain")(spark, dir)
      .as[(Long, String, Option[String], Option[String])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, host, rd, sfx) =>
      assert((rd, sfx) == refParse(host), s"doc $id host $host")
    }
    // coverage: multi-label suffix, private suffix, unknown TLD
    // (default rule), the bare-suffix host every 97th doc plants, the
    // *.ck wildcard (bare suffix AND registrable-one-under), and the
    // !www.ck exception carve-out
    val suffixes = got.flatMap(_._4).toSet
    assert(Set("co.uk", "ac.jp", "github.io", "xyz").subsetOf(suffixes))
    assert(got.exists { case (id, host, rd, _) =>
      id % 97 == 0 && host == "github.io" && rd.isEmpty })
    assert(got.exists { case (_, host, rd, sfx) =>
      host == "www.ck" && rd.contains("www.ck") && sfx.contains("ck") },
      "exception trap host must occur and parse as registrable")
    assert(got.exists { case (_, host, rd, sfx) =>
      host == "foo.ck" && rd.isEmpty && sfx.contains("foo.ck") },
      "wildcard bare-suffix trap host must occur")
    assert(got.exists { case (_, host, rd, sfx) =>
      host == "a.b.ck" && rd.contains("a.b.ck") && sfx.contains("b.ck") },
      "wildcard one-under trap host must occur")
    assert(got.exists { case (_, host, rd, sfx) =>
      host == "demo.kawasaki.jp" && rd.isEmpty &&
        sfx.contains("demo.kawasaki.jp") },
      "wildcard-under-plain trap host must occur")
  }

  test("q144 == the declarative row_number cap it replaces (top 5 per " +
      "domain by quality, ties to lower doc_id)") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(Provenance.registeredDomain(col("doc_id"))
          .as("registered_domain"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        col("doc_id"))
      .filter(col("registered_domain").isNotNull)
    val ref = docs
      .withColumn("rk", row_number().over(Window
        .partitionBy("registered_domain")
        .orderBy(col("quality").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= 5)
      .select("registered_domain", "doc_id", "quality", "rk")
      .as[(String, Long, Double, Long)].collect().toSet
    val got = queries("q144_domain_cap")(spark, dir)
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == ref)
    assert(got.nonEmpty)
    // the cap binds: some domain has more than 5 docs in the corpus
    assert(docs.groupBy("registered_domain").count()
      .filter(col("count") > 5).count() > 0,
      "corpus must exercise the cap, not just rank everything")
  }

  test("q145 totals == q106 totals (same pair table, different rollup " +
      "key); every q145 row is internally consistent") {
    val dom = queries("q145_domain_dedup")(spark, dir)
      .as[(Option[String], Long, Long, Double)].collect()
    val src = queries("q106_dedup_report")(spark, dir)
      .select("n_docs", "n_dup_docs").as[(Long, Long)].collect()
    assert(dom.map(_._2).sum == src.map(_._1).sum) // corpus size
    assert(dom.map(_._3).sum == src.map(_._2).sum) // dup-doc count
    dom.foreach { case (rd, n, nd, rate) =>
      assert(nd <= n, s"$rd: $nd dup of $n")
      assert(math.abs(rate - nd.toDouble / n) < 1e-6, s"$rd rate")
    }
    // the bare-suffix docs (doc_id % 97 == 0) appear as the NULL group
    assert(dom.exists(_._1.isEmpty), "null-domain audit row expected")
  }

  test("q150 == in-memory bucket-greedy replica; the 500-token budget " +
      "binds for some domains and is a whole-bucket prefix everywhere") {
    val rows = graft.sources.Tables.load(spark, dir, "documents")
      .select(Provenance.registeredDomain(col("doc_id")).as("rd"),
        floor(TextAnalysis.qualityScore(col("text")) * 100)
          .cast("int").as("qb"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .filter(col("rd").isNotNull)
      .as[(String, Int, Long)].collect()
    val ref = rows.groupBy(_._1).map { case (rd, docs) =>
      val buckets = docs.groupBy(_._2).map { case (qb, g) =>
        (qb, g.length.toLong, g.map(_._3).sum)
      }.toSeq.sortBy(-_._1) // best quality first
      val cum = buckets.scanLeft(0L)(_ + _._3).tail
      val kept = buckets.zip(cum).takeWhile(_._2 <= 500L).map(_._1)
      (rd, (docs.length.toLong, docs.map(_._3).sum,
        kept.lastOption.map(_._1),
        kept.map(_._2).sum, kept.map(_._3).sum))
    }
    val got = queries("q150_token_budget")(spark, dir)
      .as[(String, Long, Long, Option[Int], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == ref)
    // the budget is real on this corpus: some domain is cut, some not
    assert(got.values.exists(v => v._5 < v._2 && v._2 > 500),
      "no domain was budget-cut")
    assert(got.values.exists(v => v._5 == v._2), "no domain fit whole")
    got.values.foreach(v => assert(v._5 <= 500, s"budget exceeded: $v"))
  }

  test("q149 opt-out gate: exactly the listed domains' docs flag, at " +
      "publisher granularity; null-domain docs pass") {
    val got = queries("q149_optout_gate")(spark, dir)
      .as[(Long, Option[String], Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, rd, out) =>
      assert(out == rd.exists(Provenance.optOutDomains.contains),
        s"doc $id domain $rd")
    }
    // the list residues (24, 2, 28 mod 60) occur in the corpus, and the
    // flag hits EVERY host spelling of an opted-out publisher (www./
    // cdn./bare all share the registered domain)
    val flagged = got.filter(_._3)
    assert(flagged.nonEmpty, "opt-out residues must occur")
    assert(flagged.map(_._1 % 60).toSet.subsetOf(Set(24L, 2L, 28L)))
    assert(got.filter(_._2.isEmpty).forall(!_._3),
      "provenance-less docs cannot be matched to an opt-out")
  }

  test("q147 == in-memory normalize-and-group replica; scheme/www/utm/" +
      "slash spellings collapse and the raw-variant count proves it") {
    val ids = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id").as[Long].collect()
    def url(i: Long): String =
      (if (i % 2 == 0) "https://" else "http://") +
        (if (i % 4 < 2) "" else "www.") +
        s"site${i % 25}.com/p/${i % 50}" +
        (if (i % 5 == 0) "?utm_source=feed" else "") +
        (if (i % 7 == 0) "/" else "")
    def norm(u: String): String = u
      .replaceAll("^https?://", "").replaceAll("^www\\.", "")
      .replaceAll("\\?.*$", "").replaceAll("/+$", "").toLowerCase
    val ref = ids.groupBy(i => norm(url(i))).map { case (k, g) =>
      (k, g.min, g.length.toLong, g.map(url).distinct.length.toLong)
    }.toSet
    val got = queries("q147_url_dedup")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == ref)
    // normalization genuinely fires: some group holds >1 raw spelling,
    // and no normalized key still carries scheme/www/query decoration
    assert(got.exists(_._4 > 1), "planted raw variants must collapse")
    got.foreach { case (k, _, _, _) =>
      assert(!k.contains("://") && !k.startsWith("www.") &&
        !k.contains("?") && !k.endsWith("/"), k)
    }
  }
}
