package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins [[PublicSuffixParse]]'s semantics on every edge the
  * publicsuffix.org algorithm defines: longer rule beats shorter
  * (`co.uk` over `uk`), private-section suffixes (`github.io` over
  * `io`), wildcard rules (`*.ck` — `*` matches exactly one label),
  * exception rules (`!www.ck` prevails and re-opens registration),
  * the default `*` rule for unknown TLDs, a host that IS a suffix
  * (no registrable part), case-insensitivity, and invalid hostnames.
  * The wildcard/exception cases mirror the published algorithm's
  * canonical checkPublicSuffix test vectors for the `ck` and
  * `kawasaki.jp` families. */
class PublicSuffixSpec extends SparkSuite {
  import spark.implicits._

  private val rules = Seq("com", "uk", "co.uk", "io", "github.io",
    "k12.va.us", "us", "jp", "*.ck", "!www.ck", "*.kawasaki.jp")

  private def parse(hosts: String*): Map[String, (Option[String], Option[String])] =
    hosts.toDF("host")
      .select(col("host"), PublicSuffixParse(col("host"), rules).as("p"))
      .select(col("host"), col("p.registered_domain"), col("p.public_suffix"))
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("longest rule wins: co.uk beats uk; deep subdomains collapse") {
    val got = parse("www.site.co.uk", "a.b.c.site.co.uk", "site.uk")
    assert(got("www.site.co.uk") == ((Some("site.co.uk"), Some("co.uk"))))
    assert(got("a.b.c.site.co.uk") == ((Some("site.co.uk"), Some("co.uk"))))
    // no co.* above it: plain `uk` rule applies
    assert(got("site.uk") == ((Some("site.uk"), Some("uk"))))
  }

  test("private-section suffix: x.github.io and y.github.io are " +
      "DIFFERENT registered domains") {
    val got = parse("x.github.io", "y.github.io", "deep.x.github.io")
    assert(got("x.github.io") == ((Some("x.github.io"), Some("github.io"))))
    assert(got("y.github.io") == ((Some("y.github.io"), Some("github.io"))))
    assert(got("deep.x.github.io") ==
      ((Some("x.github.io"), Some("github.io"))))
  }

  test("three-label rule and the default * rule for unknown TLDs") {
    val got = parse("school.k12.va.us", "plain.va.us",
      "www.site.xyz", "site.xyz")
    assert(got("school.k12.va.us") ==
      ((Some("school.k12.va.us"), Some("k12.va.us"))))
    // no va.us rule: plain `us` applies
    assert(got("plain.va.us") == ((Some("va.us"), Some("us"))))
    // xyz not in the list: last label is the suffix (PSL default rule)
    assert(got("www.site.xyz") == ((Some("site.xyz"), Some("xyz"))))
    assert(got("site.xyz") == ((Some("site.xyz"), Some("xyz"))))
  }

  test("a host that IS a public suffix has no registrable part; a bare " +
      "unknown label is a bare TLD") {
    val got = parse("github.io", "co.uk", "com", "localhost")
    assert(got("github.io") == ((None, Some("github.io"))))
    assert(got("co.uk") == ((None, Some("co.uk"))))
    assert(got("com") == ((None, Some("com"))))
    assert(got("localhost") == ((None, Some("localhost"))))
  }

  test("matching is case-insensitive and invalid hostnames yield nulls") {
    val got = parse("WWW.Site.CO.UK", "bad..host", ".leading", "trailing.")
    assert(got("WWW.Site.CO.UK") == ((Some("site.co.uk"), Some("co.uk"))))
    assert(got("bad..host") == ((None, None)))
    assert(got(".leading") == ((None, None)))
    assert(got("trailing.") == ((None, None)))
  }

  test("wildcard rule: * matches exactly one label (the PSL ck vectors)") {
    val got = parse("ck", "this.ck", "a.this.ck", "b.a.this.ck")
    // `ck` itself: *.ck needs two labels, no other rule matches → the
    // default rule makes the bare label its own suffix
    assert(got("ck") == ((None, Some("ck"))))
    // one label under the wildcard IS a public suffix
    assert(got("this.ck") == ((None, Some("this.ck"))))
    // two labels under it are registrable
    assert(got("a.this.ck") == ((Some("a.this.ck"), Some("this.ck"))))
    assert(got("b.a.this.ck") == ((Some("a.this.ck"), Some("this.ck"))))
  }

  test("exception rule prevails: !www.ck carves registration back out " +
      "of *.ck") {
    val got = parse("www.ck", "sub.www.ck", "deep.sub.www.ck")
    // the exception match itself is the registered domain; its suffix
    // is the rule minus the leftmost label
    assert(got("www.ck") == ((Some("www.ck"), Some("ck"))))
    assert(got("sub.www.ck") == ((Some("www.ck"), Some("ck"))))
    assert(got("deep.sub.www.ck") == ((Some("www.ck"), Some("ck"))))
  }

  test("wildcard under a plain rule: *.kawasaki.jp outranks jp by label " +
      "count; kawasaki.jp itself stays registrable under jp") {
    val got = parse("kawasaki.jp", "x.kawasaki.jp", "y.x.kawasaki.jp",
      "plain.jp")
    assert(got("kawasaki.jp") == ((Some("kawasaki.jp"), Some("jp"))))
    assert(got("x.kawasaki.jp") == ((None, Some("x.kawasaki.jp"))))
    assert(got("y.x.kawasaki.jp") ==
      ((Some("y.x.kawasaki.jp"), Some("x.kawasaki.jp"))))
    assert(got("plain.jp") == ((Some("plain.jp"), Some("jp"))))
  }

  test("rule-grammar validation: single-label exceptions and empty " +
      "wildcard bases fail at analysis") {
    val bad1 = intercept[Exception] {
      Seq("x.ck").toDF("host")
        .select(PublicSuffixParse(col("host"), Seq("!ck"))).collect()
    }
    assert(bad1.getMessage.contains("exception"))
    val bad2 = intercept[Exception] {
      Seq("x.ck").toDF("host")
        .select(PublicSuffixParse(col("host"), Seq("*."))).collect()
    }
    assert(bad2.getMessage.contains("wildcard"))
  }

  test("null input propagates; non-string input fails at analysis") {
    val got = Seq(Option.empty[String]).toDF("host")
      .select(PublicSuffixParse(col("host"), rules)
        .getField("registered_domain"))
      .collect()
    assert(got.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1L).toDF("host")
        .select(PublicSuffixParse(col("host"), rules)).collect()
    }
    assert(err.getMessage.contains("public_suffix_parse"))
  }
}
