package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix parse of a hostname — registered domain + public suffix
  * under the FULL publicsuffix.org algorithm (the provenance primitive
  * RefinedWeb §3.1-style URL dedup and per-domain caps key on:
  * "a.b.site.co.uk" and "site.co.uk" are the SAME owner, while
  * "x.github.io" and "y.github.io" are DIFFERENT owners because
  * github.io is a (private-section) suffix). Spark has no built-in;
  * `parse_url` stops at the host.
  *
  * Rule grammar is the published list's own (rules are DATA — the
  * stand-in ships as a resource file in the same line format, and the
  * ~9k-entry production list drops in unchanged):
  *  - `suffix`       — a plain rule;
  *  - `*.base`       — a wildcard rule: `*` matches exactly ONE label
  *                     (so `*.ck` matches `foo.ck` but not `ck`);
  *  - `!name`        — an exception rule: where it matches it PREVAILS
  *                     over every other rule, and the public suffix is
  *                     the rule minus its leftmost label (`!www.ck` →
  *                     www.ck is REGISTRABLE with suffix `ck`, carving
  *                     a hole out of `*.ck`).
  *
  * Matching (publicsuffix.org algorithm over the parsed rule sets):
  *  - labels are matched case-insensitively, right-to-left;
  *  - if any exception rule matches, it prevails: registered domain =
  *    the matched labels, public suffix = those labels minus the
  *    leftmost;
  *  - otherwise the matching plain/wildcard rule with the MOST labels
  *    prevails: registered domain = matched suffix plus one label; a
  *    host that IS a public suffix has no registered domain (null,
  *    suffix = host);
  *  - no rule matches → the PSL default `*` rule: the last label is
  *    the suffix, registered = last two labels (a bare single unknown
  *    label is itself the public suffix: registered = null,
  *    suffix = host);
  *  - an empty label anywhere (leading/trailing/double dot) is not a
  *    valid hostname → both fields null.
  *
  * One expression, one walk: both outputs come from the same suffix
  * scan, so callers project fields from the struct instead of parsing
  * twice. CodegenFallback is deliberate — the split/set-probe loop
  * dominates and runs ≤ 3·|labels| set lookups per row, no allocation
  * beyond the label array. The rule list is a constructor argument
  * (bounded, ships in the serialized expression like a task
  * broadcast); the oracle replays the same algorithm as a JOIN against
  * the list-as-table. */
case class PublicSuffixParse(child: Expression, suffixes: Seq[String])
    extends UnaryExpression with CodegenFallback {

  /** The three rule classes of the PSL grammar, parsed once. Wildcard
    * rules are stored by their BASE (the labels after `*.`); exception
    * rules by the matched name (after `!`). */
  @transient private lazy val (plainSet, wildcardBases, exceptionSet) = {
    val p = Set.newBuilder[String]
    val w = Set.newBuilder[String]
    val x = Set.newBuilder[String]
    suffixes.map(_.toLowerCase).foreach { r =>
      if (r.startsWith("!")) x += r.substring(1)
      else if (r.startsWith("*.")) w += r.substring(2)
      else p += r
    }
    (p.result(), w.result(), x.result())
  }

  override def dataType: DataType = StructType(Seq(
    StructField("registered_domain", StringType, nullable = true),
    StructField("public_suffix", StringType, nullable = true)))
  override def prettyName: String = "public_suffix_parse"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string host, got ${child.dataType.simpleString}")
    else if (suffixes.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a non-empty rule list")
    else if (suffixes.exists(r => r.startsWith("!") && !r.contains(".")))
      // an exception rule's suffix is the rule minus its leftmost label,
      // so a single-label exception would yield an EMPTY suffix — the
      // published list has none (exceptions always carve wildcards)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: single-label exception rules are not valid PSL " +
          s"(${suffixes.filter(r => r.startsWith("!") && !r.contains(".")).mkString(", ")})")
    else if (suffixes.exists(r => r.startsWith("*.") && r.length == 2))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: wildcard rule with an empty base")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val host = input.asInstanceOf[UTF8String].toString.toLowerCase
    // split -1 keeps trailing empties so "a.b." is seen as invalid
    val labels = host.split("\\.", -1)
    val row = new GenericInternalRow(2)
    if (labels.length == 0 || labels.exists(_.isEmpty)) return row // nulls
    // candidate suffixes from longest (i=0, whole host) to shortest;
    // track the first (longest) exception match and the first regular
    // (plain-or-wildcard) match. The exception scan runs the full walk
    // even after a regular hit: an exception prevails REGARDLESS of
    // label count (publicsuffix.org: "the prevailing rule is the one
    // which is an exception rule").
    var exc = -1
    var reg = -1
    var i = 0
    while (i < labels.length && exc < 0) {
      val cand = labels.drop(i).mkString(".")
      if (exceptionSet.contains(cand)) exc = i
      else if (reg < 0 && (plainSet.contains(cand) ||
        (i + 1 < labels.length &&
          wildcardBases.contains(labels.drop(i + 1).mkString("."))))) reg = i
      i += 1
    }
    if (exc >= 0) {
      // exception prevails: suffix = rule minus leftmost label (never
      // empty — single-label exceptions are rejected at type check);
      // registered = exactly the matched labels
      row.update(0, UTF8String.fromString(labels.drop(exc).mkString(".")))
      row.update(1, UTF8String.fromString(labels.drop(exc + 1).mkString(".")))
    } else if (reg >= 0) {
      if (reg == 0) { // the host IS a public suffix: no registrable part
        row.update(1, UTF8String.fromString(host))
      } else {
        row.update(0, UTF8String.fromString(labels.drop(reg - 1).mkString(".")))
        row.update(1, UTF8String.fromString(labels.drop(reg).mkString(".")))
      }
    } else if (labels.length >= 2) {
      // PSL default rule `*`: unknown TLD is itself the suffix
      row.update(0, UTF8String.fromString(
        labels.drop(labels.length - 2).mkString(".")))
      row.update(1, UTF8String.fromString(labels.last))
    } else {
      // a bare unknown label is itself the public suffix (default rule
      // with nothing above it): registered = null, suffix = host
      row.update(1, UTF8String.fromString(host))
    }
    row
  }

  override protected def withNewChildInternal(
      newChild: Expression): PublicSuffixParse = copy(child = newChild)
}

object PublicSuffixParse {
  import org.apache.spark.sql.Column

  def apply(c: Column, suffixes: Seq[String]): Column =
    org.apache.spark.sql.graft.bridge.column(
      PublicSuffixParse(
        org.apache.spark.sql.graft.bridge.expression(c), suffixes))
}
