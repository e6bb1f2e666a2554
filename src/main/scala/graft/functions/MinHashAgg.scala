package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** MinHash signature as a single-buffer imperative aggregate.
  *
  * The declarative form (64 separate `min(pmod(h0*a+b, P))` aggregate
  * columns, Dedup round-2) allocates 64 independent agg slots per group
  * and evaluates 64 Catalyst expression trees per input row. This
  * aggregate keeps ONE `Array[Long](k)` buffer per group and runs the
  * whole permutation family in a tight JVM loop per row — the standard
  * TypedImperativeAggregate shape Spark itself uses for percentile /
  * collect-style aggregates (executed by ObjectHashAggregateExec with
  * sort-based spill fallback, so group explosion degrades, not OOMs).
  *
  * Value-identical to the declarative form: Spark's `pmod(h0 * a + b, P)`
  * wraps the multiply in 64-bit two's-complement then takes the positive
  * mod — exactly `Math.floorMod(h0 * a + b, P)` on wrapped longs — so
  * signatures, band hashes, and the q21/q23/q36 pair sets are unchanged.
  *
  * Input `child` must be the pre-hashed feature `pmod(xxhash64(f), P)`.
  */
case class MinHashAgg(
    child: Expression,
    as: Seq[Long],
    bs: Seq[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val k = as.length
  // Seq in the case-class signature (plan canonicalization compares by
  // value); primitive arrays in the hot loop
  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val h = java.lang.Math.floorMod(h0 * aArr(i) + bArr(i), p)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** `minhash_sig(h0)` as a Column aggregate: k-long signature array. */
  def sig(h0: Column, perms: Seq[(Long, Long)], p: Long): Column =
    bridge.column(
      MinHashAgg(bridge.expression(h0), perms.map(_._1), perms.map(_._2), p)
        .toAggregateExpression())
}
