package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property pin for [[PublicSuffixParse]]: for RANDOM hosts assembled
  * from a small label alphabet (so collisions with the rule list —
  * including multi-label and nested rules — are frequent, not
  * accidental), the expression must equal an independent in-JVM
  * longest-match replica on every generated host, covering
  * combinations the hand cases in PublicSuffixSpec don't enumerate
  * (rules above rules, repeated labels, rule labels in non-suffix
  * positions). */
class PublicSuffixPropertySpec extends SparkSuite {
  import spark.implicits._

  // rules with deliberate nesting: uk < co.uk, io < github.io,
  // us < va.us < k12.va.us — the longest match must win at every level
  private val rules = Seq("com", "uk", "co.uk", "io", "github.io",
    "us", "va.us", "k12.va.us")
  private val ruleSet = rules.toSet

  private def refParse(host: String): (Option[String], Option[String]) = {
    val labels = host.toLowerCase.split("\\.", -1)
    if (labels.isEmpty || labels.exists(_.isEmpty)) return (None, None)
    (0 until labels.length)
      .find(i => ruleSet.contains(labels.drop(i).mkString(".")))
      .map { i =>
        if (i == 0) (None, Some(host.toLowerCase))
        else (Some(labels.drop(i - 1).mkString(".")),
          Some(labels.drop(i).mkString(".")))
      }
      .getOrElse {
        if (labels.length >= 2)
          (Some(labels.takeRight(2).mkString(".")), Some(labels.last))
        else (None, Some(host.toLowerCase))
      }
  }

  // the alphabet reuses the rule labels so generated hosts regularly
  // end in (or contain mid-host) real rule sequences
  private val genLabel: Gen[String] =
    Gen.oneOf("a", "b", "site", "com", "uk", "co", "io", "github",
      "us", "va", "k12", "WWW")
  private val genHost: Gen[String] = for {
    n <- Gen.choose(1, 6)
    labels <- Gen.listOfN(n, genLabel)
  } yield labels.mkString(".")

  test("expression == in-JVM longest-match replica on 500 random hosts") {
    val hosts = Gen.listOfN(500, genHost)
      .apply(Gen.Parameters.default, Seed(20260815L))
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
  }
}
