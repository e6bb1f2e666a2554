package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs: keeps at most k
  * entries per group IN THE AGGREGATION BUFFER, so Spark's partial
  * aggregation ships k rows per map partition per group instead of the
  * whole candidate set — the scale-correct alternative to both
  * `collect_list` (unbounded buffer) and a `row_number()` window (full
  * shuffle + per-key sort) for top-k-per-key.
  *
  * Ordering: score DESC, then id ASC — ties are deterministic.
  */
final case class ScoredId(score: Double, id: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def prune(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.size < k) prune(b :+ a)
    else if (a.score > b.last.score ||
      (a.score == b.last.score && a.id < b.last.id)) prune(b :+ a)
    else b
  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    prune(x ++ y)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
