package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over the word sequence of a text column — the
  * document fingerprint of q33 (order-sensitive, unlike the shingle-set
  * measures).
  *
  * The declarative form — `aggregate(slice(transform(words, md5…)…))` —
  * evaluates interpreted lambda trees per WORD (higher-order functions sit
  * outside whole-stage codegen), the same per-element cost already
  * measured and replaced for shingling (see [[NGramExpression]]); it was
  * the slowest query of the round-3 bench. This expression runs one tight
  * JVM loop per ROW with semantics identical to the declarative form and
  * the DuckDB oracle:
  *
  *   words = trim(text) split on \s+
  *   h(w)  = int(hex(md5(w))[0,8)) mod 1000000007
  *   fp    = foldLeft over words: acc = (acc * 31 + h(w)) mod 1000000007,
  *           seeded with h(words(0))
  *
  * All intermediates stay < 2^36, so plain long arithmetic is exact; the
  * first 8 md5 hex chars are the leading 4 digest bytes read big-endian.
  */
case class RollingHash(child: Expression) extends UnaryExpression
    with CodegenFallback {
  private val P = 1000000007L

  // one digest per task-local expression copy; digest() resets it per call
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].trim().toString.split("\\s+")
    var acc = 0L
    var i = 0
    while (i < words.length) {
      val d = md.digest(
        words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = leading 4 digest bytes, big-endian unsigned
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % P
      acc = if (i == 0) h else (acc * 31L + h) % P
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
}

object RollingHash {
  def apply(text: Column): Column =
    bridge.column(RollingHash(bridge.expression(text)))
}
