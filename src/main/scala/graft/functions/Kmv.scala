package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-set sketch aggregator: keeps the k
  * SMALLEST DISTINCT hash values seen per group IN THE AGGREGATION
  * BUFFER (Bar-Yossef 2002; Beyer SIGMOD'07 for the union/Jaccard
  * estimators). Feeding the raw hash multiset is correct — min-k over a
  * multiset equals min-k over its set, and the buffer dedups — so no
  * per-group DISTINCT shuffle ever runs: partial aggregation ships ≤ k
  * longs per map partition per group, the same bounded-buffer posture
  * as [[TopKAggregator]].
  *
  * The finished sketch (a sorted ≤k-long array) composes: union = min-k
  * of the concatenation; Jaccard(A,B) ≈ |KMV(A∪B) ∩ A ∩ B| / k — pure
  * array arithmetic on 8·k bytes per group, so cross-SOURCE overlap
  * matrices need only |sources| sketch rows, never a token-level pair
  * join. Deterministic given the hash — an md5-derived hash makes the
  * sketch itself replayable in any engine (the q134 calibration
  * posture).
  */
final class BottomKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length == k && a >= b.last) b
    else {
      // sorted insert-distinct; the buffer is tiny (≤ k) so the linear
      // scan beats allocating a set per row
      val i = b.indexWhere(_ >= a)
      if (i >= 0 && b(i) == a) b
      else {
        val at = if (i < 0) b.length else i
        ((b.take(at) :+ a) ++ b.drop(at)).take(k)
      }
    }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
