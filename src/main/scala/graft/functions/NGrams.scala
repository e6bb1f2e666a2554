package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram/shingle expressions for the dedup family.
  *
  * The declarative forms — `transform(sequence(...), i =>
  * concat_ws(" ", slice(words, i, n)))` and the substr variant for char
  * grams — are correct but evaluate interpreted lambda trees per ELEMENT
  * (higher-order functions sit outside whole-stage codegen); measured at
  * ~14 µs per shingle, they dominate every near-dup query. These
  * expressions do one tight JVM loop per ROW instead (CodegenFallback:
  * the row-level call is interpreted, the per-element work is plain
  * Scala), with semantics identical to the declarative forms and the
  * DuckDB oracles: trim → split on \s+ → space-joined n-grams →
  * first-occurrence-order distinct; short inputs yield the declarative
  * forms' edge results.
  */
abstract class NGramExpression extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  protected def distinctArray(items: Iterator[String]): GenericArrayData = {
    val seen = new mutable.LinkedHashSet[String]
    items.foreach(seen.add)
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** UTF-16 offset of each code-point boundary: `offs(i)` = offset where
    * the i-th code point starts, `offs(last)` = s.length, so the string
    * has `offs.length - 1` code points and the window of n code points
    * starting at code point i is `s.substring(offs(i), offs(i + n))`.
    *
    * Char windows MUST count code points, not UTF-16 units: consumers
    * apply the array index via Spark `substr`/`length` (UTF8String —
    * code points), and the DuckDB oracles do the same, so on text with
    * supplementary characters (emoji, rare CJK) UTF-16 indexing would
    * cut the wrong characters. On surrogate-free text (the common case)
    * this degenerates to identity offsets. */
  protected def codePointOffsets(s: String): Array[Int] = {
    val offs = new Array[Int](s.codePointCount(0, s.length) + 1)
    var i = 0
    var k = 0
    while (i < s.length) {
      offs(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    offs(k) = s.length
    offs
  }
}

/** Distinct word n-gram shingles: "a b c d" → ["a b c", "b c d"] (n=3);
  * fewer than n words → empty. */
case class WordShingles(child: Expression, n: Int) extends NGramExpression {
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].trim().toString
      .split("\\s+").filter(_.nonEmpty)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else distinctArray(
      (0 to words.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        sb.toString
      })
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** ALL word n-gram occurrences in order (the non-distinct sibling of
  * [[WordShingles]]) — for frequency-weighted consumers (language-model
  * counts, hashed-feature distributions) where each occurrence carries
  * weight; semantics identical to the declarative
  * `zip_with(slice(w,1,m), slice(w,2,m), concat)` chain and the oracle's
  * `list_transform(range(len-n+1), ...)`. */
case class WordGrams(child: Expression, n: Int) extends NGramExpression {
  override def prettyName: String = "word_grams"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].trim().toString
      .split("\\s+").filter(_.nonEmpty)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      (0 to words.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        UTF8String.fromString(sb.toString)
      }.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): WordGrams =
    copy(child = c)
}

/** Distinct character n-grams: sliding window of n code points; inputs
  * shorter than n yield the whole string (matching the declarative
  * `sequence(1, greatest(len-n+1, 1))` edge case — Spark `length` and
  * `substr` both count code points, as does the DuckDB oracle). */
case class CharGrams(child: Expression, n: Int) extends NGramExpression {
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val offs = codePointOffsets(s)
    val m = offs.length - 1
    if (m <= n) distinctArray(Iterator.single(s))
    else distinctArray(
      (0 to m - n).iterator.map(i => s.substring(offs(i), offs(i + n))))
  }

  override protected def withNewChildInternal(c: Expression): CharGrams =
    copy(child = c)
}

/** ALL character n-gram windows in ORDER (non-distinct — the positional
  * sibling of [[CharGrams]], for `posexplode` consumers where the array
  * index IS the 0-based CODE-POINT window start, e.g. exact-substring
  * span removal: the index is applied downstream via Spark
  * `substr`/`length`, which count code points, so the window here must
  * too — UTF-16 indexing would misalign removal spans on text with
  * supplementary characters. Inputs shorter than n code points yield an
  * empty array: a text with no full window contributes no duplication
  * evidence and no removable span — deliberately NOT [[CharGrams]]'s
  * whole-string edge, which exists for set-similarity semantics. */
case class CharWindowGrams(child: Expression, n: Int) extends NGramExpression {
  override def prettyName: String = "char_window_grams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val offs = codePointOffsets(s)
    val m = offs.length - 1
    if (m < n) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      (0 to m - n).iterator
        .map(i => UTF8String.fromString(s.substring(offs(i), offs(i + n))))
        .toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): CharWindowGrams =
    copy(child = c)
}

object NGrams {
  def wordShingles(text: Column, n: Int = 3): Column =
    bridge.column(WordShingles(bridge.expression(text), n))
  def wordGrams(text: Column, n: Int): Column =
    bridge.column(WordGrams(bridge.expression(text), n))
  def charGrams(text: Column, n: Int = 5): Column =
    bridge.column(CharGrams(bridge.expression(text), n))
  def charWindowGrams(text: Column, n: Int): Column =
    bridge.column(CharWindowGrams(bridge.expression(text), n))
}
