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
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a single-buffer
  * mergeable aggregate: `d` counter rows of width `w`, item increments
  * one counter per row, point estimate = min over rows — always an
  * OVERestimate, with error ≤ εN at ε = e/w in the classic analysis.
  *
  * This is the bounded-memory counterpart of the exact token groupBy
  * (q62): the sketch is d·w longs per partition REGARDLESS of
  * vocabulary size, partials merge by element-wise ADD (map-side
  * combine ships one 8·d·w-byte array per partition, never the
  * vocabulary), and the merged sketch answers any point query after the
  * fact — the standard pre-aggregation for heavy-hitter candidates at
  * corpus scales where even the (token, count) table is too wide to
  * ship. Deterministic and portable by construction: row r's bucket is
  * hex slice r of ONE md5 per item (`md5(token)[8r, 8r+8) % w`, one
  * digest amortized over all d rows), the same arithmetic a DuckDB
  * oracle can unroll — so unlike a seeded-hash sketch the counters are
  * bit-identical cross-engine and the gate can hash-match them.
  */
case class CountMinAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d >= 1 && d <= 4, s"d=$d: md5 yields 4 independent 8-hex slices")
  require(w >= 2, s"w=$w")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(v.asInstanceOf[UTF8String].getBytes)
      var r = 0
      while (r < d) {
        val slice = java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16)
        buf(r * w + (slice % w).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  /** `count_min_sketch(item)` as a Column aggregate: the d·w counter
    * array, row-major (row r at positions [r·w, (r+1)·w)). */
  def sketch(item: Column, d: Int = 4, w: Int = 256): Column =
    bridge.column(
      CountMinAgg(bridge.expression(item), d, w).toAggregateExpression())
}
