package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CharGrams, DotProduct, RollingHash, WinnowedFingerprints, WordGrams, WordShingles}

/** SQL surface for the engine's native Catalyst expressions, injected via
  * the standard `SparkSessionExtensions` hook — set
  * `spark.sql.extensions=graft.GraftExtensions` (done by
  * [[Engine.session]]) and the functions below are callable from plain
  * `spark.sql`, exactly like built-ins:
  *
  *   - `rolling_hash(text)` — the q33 document fingerprint fold
  *   - `dot_product(a, b)` — deterministic left-to-right double dot
  *   - `word_shingles(text, n)` — distinct word n-grams
  *   - `char_grams(text, n)` — distinct character n-grams
  *   - `pii_redact(text)` — the q93 email/phone/IPv4 masking
  *   - `quality_score(text)` — the q30/q39 composite quality heuristic
  *
  * The last two are not native expressions but COMPOSITIONS of
  * built-ins (`graft.operators` column builders); injection hands the
  * resolver the composed tree, so they stay fully codegen'd — the same
  * body the DataFrame operators run.
  *
  * This is the extension tier between composing built-ins and a custom
  * strategy: the expressions already power the DataFrame operators
  * (`graft.functions`); registration only adds name resolution, so SQL
  * users (the reference's entire audience — its interface IS a SQL
  * client, README.md:100-104) reach them without touching the Scala API.
  * The n-arguments must be literal integers — they size the per-row
  * loop, which codegen/eval fixes at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: n must be a literal integer, got $other")
  }

  // Arity guard for every builder (ADVICE r5): without it a wrong-arity
  // call surfaces as NoSuchElementException/IndexOutOfBounds out of the
  // function registry — and EXTRA arguments were silently ignored, which
  // is worse (a user's third argument changed nothing, with no error).
  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$fn requires exactly $n argument(s), got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => {
        arity(args, 1, "rolling_hash"); RollingHash(args.head) }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        arity(args, 2, "dot_product"); DotProduct(args(0), args(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_shingles")
        WordShingles(args(0), litInt(args(1), "word_shingles")) }))
    ext.injectFunction((
      new FunctionIdentifier("char_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "char_grams"),
      (args: Seq[Expression]) => {
        arity(args, 2, "char_grams")
        CharGrams(args(0), litInt(args(1), "char_grams")) }))
    ext.injectFunction((
      new FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[WordGrams].getName, "word_grams"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_grams")
        WordGrams(args(0), litInt(args(1), "word_grams")) }))
    ext.injectFunction((
      new FunctionIdentifier("winnowed_fingerprints"),
      new ExpressionInfo(classOf[WinnowedFingerprints].getName,
        "winnowed_fingerprints"),
      (args: Seq[Expression]) => {
        arity(args, 3, "winnowed_fingerprints")
        WinnowedFingerprints(args(0),
          litInt(args(1), "winnowed_fingerprints"),
          litInt(args(2), "winnowed_fingerprints")) }))
    // Spark 4 Columns wrap ColumnNodes, not Expressions — the bridge
    // (see its scaladoc) converts both ways so the operators' Column
    // compositions register as SQL functions unchanged
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ext.injectFunction((
      new FunctionIdentifier("pii_redact"),
      new ExpressionInfo(graft.operators.Curation.getClass.getName, "pii_redact"),
      (args: Seq[Expression]) => {
        arity(args, 1, "pii_redact")
        ColumnBridge.expression(
          graft.operators.Curation.piiRedact(ColumnBridge.column(args.head))) }))
    ext.injectFunction((
      new FunctionIdentifier("quality_score"),
      new ExpressionInfo(graft.operators.TextAnalysis.getClass.getName, "quality_score"),
      (args: Seq[Expression]) => {
        arity(args, 1, "quality_score")
        ColumnBridge.expression(
          graft.operators.TextAnalysis.qualityScore(
            ColumnBridge.column(args.head))) }))
    ext.injectFunction((
      new FunctionIdentifier("gopher_keep"),
      new ExpressionInfo(graft.operators.TextAnalysis.getClass.getName, "gopher_keep"),
      (args: Seq[Expression]) => {
        arity(args, 1, "gopher_keep")
        ColumnBridge.expression(
          graft.operators.TextAnalysis.gopherKeep(
            ColumnBridge.column(args.head))) }))
  }
}
