package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a DIGEST-derived permutation family —
  * the cross-engine-replayable sibling of [[MinHashAgg]].
  *
  * [[MinHashAgg]]'s permutations are `(a·xxhash64(f)+b) mod P` — fast,
  * but xxhash64 and two's-complement wrap-around are Spark-specific, so
  * a DuckDB oracle can never recompute those signatures and the q21
  * family is oracled via the EXACT pair set instead (permissive banding
  * makes the banded answer == the exhaustive answer). That leaves the
  * signature VALUES — the thing a production pipeline persists, ships
  * between systems, and thresholds on — untestable cross-engine.
  *
  * This aggregate closes that hole for the calibration harness (q134):
  * hash k = `nSalts × 4` independent values per feature as the 4
  * 8-hex-char slices of `md5(salt || '|' || feature)` — one digest per
  * (salt, feature), the [[CountMinAgg]]/[[HllAgg]] portability recipe —
  * and keep the element-wise MIN per slot. Every slot is an integer min
  * of integers: bit-identical in any engine that can md5, so the oracle
  * hash-matches the ESTIMATES (matching-slot fraction), not just the
  * pair set. Costs nSalts digests per feature vs one 64-bit hash — the
  * price of portability, paid only where calibration is the point.
  *
  * Merge is element-wise min (fully mergeable, map-side combined: one
  * 8k-byte array per partition crosses the shuffle, never the feature
  * set).
  */
case class Md5MinHashAgg(
    child: Expression,
    nSalts: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(nSalts >= 1 && nSalts <= 64, s"nSalts=$nSalts")
  private val k = nSalts * 4

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val fBytes = v.asInstanceOf[UTF8String].getBytes
      var j = 0
      while (j < nSalts) {
        val prefix = (j.toString + "|").getBytes(StandardCharsets.UTF_8)
        val msg = new Array[Byte](prefix.length + fBytes.length)
        System.arraycopy(prefix, 0, msg, 0, prefix.length)
        System.arraycopy(fBytes, 0, msg, prefix.length, fBytes.length)
        val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(msg)
        var r = 0
        while (r < 4) {
          val h = java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16)
          val slot = j * 4 + r
          if (h < buf(slot)) buf(slot) = h
          r += 1
        }
        j += 1
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
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): Md5MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): Md5MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): Md5MinHashAgg =
    copy(child = newChild)
}

object Md5MinHashAgg {
  /** `md5_minhash_sig(feature)` as a Column aggregate: nSalts·4 slot
    * minima, slot j·4+r = min over features of md5(j||'|'||f) hex slice
    * [8r, 8r+8). */
  def signature(feature: Column, nSalts: Int = 16): Column =
    bridge.column(
      Md5MinHashAgg(bridge.expression(feature), nSalts)
        .toAggregateExpression())
}
