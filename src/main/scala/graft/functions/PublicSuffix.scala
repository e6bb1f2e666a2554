package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix parse of a hostname — registered domain + public suffix
  * under the publicsuffix.org longest-match algorithm (the provenance
  * primitive RefinedWeb §3.1-style URL dedup and per-domain caps key
  * on: "a.b.site.co.uk" and "site.co.uk" are the SAME owner, while
  * "x.github.io" and "y.github.io" are DIFFERENT owners because
  * github.io is a (private-section) suffix). Spark has no built-in;
  * `parse_url` stops at the host.
  *
  * Semantics (plain rules over the bounded rule list; the stand-in for
  * the ~9k-entry published list, which is data, not code):
  *  - labels are matched case-insensitively; the LONGEST rule that is a
  *    dot-suffix of the host wins;
  *  - registered domain = matched suffix plus one label; a host that IS
  *    a public suffix has no registered domain (null, suffix = host);
  *  - no rule matches → the PSL default `*` rule: the last label is the
  *    suffix, registered = last two labels (a bare single label → both
  *    null);
  *  - an empty label anywhere (leading/trailing/double dot) is not a
  *    valid hostname → both fields null.
  * Wildcard (`*.ck`) and exception (`!www.ck`) rules are out of scope
  * for the stand-in list and documented as such.
  *
  * One expression, one walk: both outputs come from the same suffix
  * scan, so callers project fields from the struct instead of parsing
  * twice. CodegenFallback is deliberate — the split/set-probe loop
  * dominates and runs ≤ |labels| set lookups per row, no allocation
  * beyond the label array. The rule list is a constructor argument
  * (bounded, ships in the serialized expression like a task broadcast);
  * the oracle replays the same longest-match as a JOIN against the
  * list-as-table. */
case class PublicSuffixParse(child: Expression, suffixes: Seq[String])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val ruleSet: Set[String] =
    suffixes.map(_.toLowerCase).toSet

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
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val host = input.asInstanceOf[UTF8String].toString.toLowerCase
    // split -1 keeps trailing empties so "a.b." is seen as invalid
    val labels = host.split("\\.", -1)
    val row = new GenericInternalRow(2)
    if (labels.length == 0 || labels.exists(_.isEmpty)) return row // nulls
    var i = 0
    while (i < labels.length) {
      // candidate suffixes from longest (i=0, whole host) to shortest
      if (ruleSet.contains(labels.drop(i).mkString("."))) {
        if (i == 0) { // the host IS a public suffix: no registrable part
          row.update(1, UTF8String.fromString(host))
        } else {
          row.update(0, UTF8String.fromString(labels.drop(i - 1).mkString(".")))
          row.update(1, UTF8String.fromString(labels.drop(i).mkString(".")))
        }
        return row
      }
      i += 1
    }
    // PSL default rule `*`: unknown TLD is itself the suffix
    if (labels.length >= 2) {
      row.update(0, UTF8String.fromString(
        labels.drop(labels.length - 2).mkString(".")))
      row.update(1, UTF8String.fromString(labels.last))
    } else {
      row.update(1, UTF8String.fromString(host)) // bare label = bare TLD
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
