package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property pin for [[PublicSuffixParse]]: for RANDOM hosts assembled
  * from a small label alphabet (so collisions with the rule list —
  * including multi-label, nested, wildcard and exception rules — are
  * frequent, not accidental), the expression must equal an independent
  * in-JVM replica of the FULL publicsuffix.org algorithm on every
  * generated host, covering combinations the hand cases in
  * PublicSuffixSpec don't enumerate (rules above rules, repeated
  * labels, rule labels in non-suffix positions, wildcards colliding
  * with plain rules, exceptions in mid-host positions). */
class PublicSuffixPropertySpec extends SparkSuite {
  import spark.implicits._

  // rules with deliberate nesting: uk < co.uk, io < github.io,
  // us < va.us < k12.va.us — the longest match must win at every level —
  // plus the wildcard/exception traps: *.ck with its !www.ck carve-out,
  // and *.kawasaki.jp sitting UNDER the plain jp rule
  private val rules = Seq("com", "uk", "co.uk", "io", "github.io",
    "us", "va.us", "k12.va.us", "jp", "*.ck", "!www.ck", "*.kawasaki.jp")

  /** Independent full-algorithm replica: exception prevails (suffix =
    * rule minus leftmost label); else longest plain-or-wildcard match
    * (`*` = exactly one label); else the default `*` rule. */
  private def refParse(host: String): (Option[String], Option[String]) = {
    val plain = rules.filterNot(r => r.startsWith("!") || r.startsWith("*.")).toSet
    val wild = rules.filter(_.startsWith("*.")).map(_.substring(2)).toSet
    val exc = rules.filter(_.startsWith("!")).map(_.substring(1)).toSet
    val labels = host.toLowerCase.split("\\.", -1)
    if (labels.isEmpty || labels.exists(_.isEmpty)) return (None, None)
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

  // the alphabet reuses the rule labels so generated hosts regularly
  // end in (or contain mid-host) real rule sequences, including the
  // wildcard/exception families
  private val genLabel: Gen[String] =
    Gen.oneOf("a", "b", "site", "com", "uk", "co", "io", "github",
      "us", "va", "k12", "WWW", "ck", "www", "kawasaki", "jp")
  private val genHost: Gen[String] = for {
    n <- Gen.choose(1, 6)
    labels <- Gen.listOfN(n, genLabel)
  } yield labels.mkString(".")

  test("expression == in-JVM full-PSL replica on 800 random hosts") {
    val hosts = Gen.listOfN(800, genHost)
      .apply(Gen.Parameters.default, Seed(20260816L))
      .getOrElse(fail("generator exhausted"))
      .distinct
    val got = hosts.toDF("host")
      .select(col("host"), PublicSuffixParse(col("host"), rules).as("p"))
      .select(col("host"), col("p.registered_domain"),
        col("p.public_suffix"))
      .as[(String, Option[String], Option[String])].collect()
    assert(got.length == hosts.length)
    got.foreach { case (host, rd, sfx) =>
      assert((rd, sfx) == refParse(host), s"host $host")
    }
    // the generator actually exercises the interesting shapes
    assert(hosts.exists(h => refParse(h)._2.exists(_.contains("."))),
      "some multi-label suffix must occur")
    assert(hosts.exists(h => refParse(h) == (None, Some(h.toLowerCase))),
      "some bare-suffix host must occur")
    assert(hosts.exists(h => h.toLowerCase.endsWith(".ck") &&
      refParse(h)._1.isEmpty), "some wildcard-suffixed host must occur")
    assert(hosts.exists(h => refParse(h)._1.contains("www.ck")),
      "some exception-carved host must occur")
  }
}
