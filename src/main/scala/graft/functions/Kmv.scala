package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-set sketch aggregate: keeps the k
  * SMALLEST DISTINCT hash values seen per group in the aggregation
  * buffer (Bar-Yossef 2002; Beyer SIGMOD'07 for the union/Jaccard
  * estimators). Feeding the raw hash multiset is correct — min-k over a
  * multiset equals min-k over its set, and the buffer dedups — so no
  * per-group DISTINCT shuffle ever runs; partial aggregation ships ≤ k
  * longs per map partition per group, the same bounded-buffer posture
  * as [[TopKAggregator]].
  *
  * The finished sketch (a sorted ≤k-long array) composes: union = min-k
  * of the concatenation; Jaccard(A,B) ≈ |KMV(A∪B) ∩ A ∩ B| / |KMV(A∪B)|
  * — pure array arithmetic on 8·k bytes per group, so cross-SOURCE
  * overlap matrices need only |sources| sketch rows, never a token-level
  * pair join. Deterministic given the hash — an md5-derived hash makes
  * the sketch itself replayable in any engine (the q134 posture).
  *
  * A [[TypedImperativeAggregate]] over a flat primitive buffer
  * (size-prefixed sorted long array, binary-search insert in place) —
  * the original `Aggregator[Long, Seq[Long], Seq[Long]]` udaf paid an
  * ExpressionEncoder round-trip plus immutable-Vector copies PER INPUT
  * ROW (measured: 1.1 s for a 206k-row aggregation at sf0.1 vs
  * microseconds of actual comparison work); this form does one boxed
  * eval per row and touches only the prefix that actually shifts. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(k >= 1, s"k=$k")

  // update() unboxes the child as Long; without a declared contract a
  // non-long child (an int hash column, say) passes analysis and dies
  // at runtime in asInstanceOf — fail at analysis like the repo's other
  // Catalyst expressions (the RollingHash/NGrams posture)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT child, got ${child.dataType.sql}")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_bottom_k"

  // buf(0) = current size n; buf(1..n) = the n smallest distinct values,
  // ascending
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](k + 1)

  private def insert(buf: Array[Long], v: Long): Unit = {
    val n = buf(0).toInt
    if (n == k && v >= buf(n)) return
    // binary search over buf[1..n]
    var lo = 1
    var hi = n + 1 // exclusive
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo <= n && buf(lo) == v) return // already present
    val newN = math.min(n + 1, k)
    // shift [lo, newN) right by one (dropping the old max when full)
    var i = newN
    while (i > lo) { buf(i) = buf(i - 1); i -= 1 }
    buf(lo) = v
    buf(0) = newN
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val m = other(0).toInt
    var i = 1
    while (i <= m) { insert(buf, other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, buf(0).toInt + 1))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bb = ByteBuffer.allocate(8 * (n + 1))
    var i = 0
    while (i <= n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong().toInt
    val buf = new Array[Long](k + 1)
    buf(0) = n
    var i = 1
    while (i <= n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  /** `kmv_bottom_k(hash)` as a Column aggregate: the k smallest distinct
    * input longs per group, as a sorted array. */
  def bottomK(hash: Column, k: Int): Column =
    bridge.column(
      KmvAgg(bridge.expression(hash), k).toAggregateExpression())
}
