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

/** Winnowed document fingerprints (Schleimer, Wilkerson, Aiken —
  * SIGMOD 2003, the MOSS algorithm): hash every character `k`-gram,
  * slide a window of `w` consecutive hashes, keep each window's MINIMUM
  * — the selected hash set fingerprints the document at ~2/(w+1) the
  * density of full k-gram hashing, with the paper's guarantee that any
  * substring match of length ≥ w+k−1 contributes at least one SHARED
  * selected hash to both documents. Emitted as the DISTINCT selected
  * values (the tie/position bookkeeping of robust winnowing only
  * affects density, never the value set, so it is dropped).
  *
  * One tight JVM loop per row (the [[NGramExpression]] rationale —
  * per-position work via higher-order functions runs interpreted per
  * element). Engine/oracle parity, bit for bit:
  *  - positions count CODEPOINTS (DuckDB `substr` semantics — the
  *    corpus has CJK text, where UTF-16 indexing would diverge);
  *  - the k-gram hash is the repo's portable recipe: first 4 md5 bytes
  *    of the gram's UTF-8 encoding as an unsigned 32-bit value, ==
  *    DuckDB `CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)`;
  *  - fewer than w hashes → one window over all of them; fewer than k
  *    codepoints → empty.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def prettyName: String = "winnowed_fingerprints"
  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val gram = new String(cps, i, k)
      val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val selected = new mutable.LinkedHashSet[Long]
    val windows = math.max(hs.length - w + 1, 1)
    var p = 0
    while (p < windows) {
      var m = hs(p)
      var j = p + 1
      val end = math.min(p + w, hs.length)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      selected.add(m)
      p += 1
    }
    new GenericArrayData(selected.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): WinnowedFingerprints =
    copy(child = c)
}

object Winnow {
  def fingerprints(text: Column, k: Int, w: Int): Column =
    bridge.column(WinnowedFingerprints(bridge.expression(text), k, w))
}
