package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CharGrams, DotProduct, RollingHash, WordShingles}

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), litInt(args(1), "word_shingles"))))
    ext.injectFunction((
      new FunctionIdentifier("char_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "char_grams"),
      (args: Seq[Expression]) =>
        CharGrams(args(0), litInt(args(1), "char_grams"))))
  }
}
