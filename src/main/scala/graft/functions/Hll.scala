package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog registers (Flajolet et al. 2007) as a single-buffer
  * mergeable aggregate: `m` byte-sized registers, item j's register is
  * raised to max(register, ρ) where ρ is the leading-zero rank of the
  * item's hash tail. Merge is element-wise MAX — the sketch estimates
  * |distinct| in O(m) memory per partition regardless of cardinality.
  *
  * This is the bounded-memory counterpart of `count(DISTINCT …)`
  * (q130's calibration pairing): the exact path shuffles the full
  * vocabulary to dedup it; the sketch ships one m-byte array per
  * partition with map-side combine, then answers from the merged
  * registers. At 100 TB the exact per-(group, value) shuffle is the
  * bottleneck and the sketch is the only shape that still runs — this
  * aggregate is the engine's path, and the q130 harness says how far
  * off its answers are.
  *
  * Deterministic and portable by construction (the [[CountMinAgg]]
  * posture): register = the first 8 md5 hex chars' low bits, ρ from hex
  * slice [8, 16) as a 32-bit value — arithmetic a DuckDB oracle replays
  * exactly (`('0x'||substr(md5(t),1,2))::INT`, `33 - length(bin(tail))`),
  * so the REGISTERS are bit-identical cross-engine, not just the
  * estimate. The estimate itself stays cross-engine-exact because every
  * term 2^-ρ is dyadic with exponent ≥ -33 and the m-term sum needs
  * ≤ 42 mantissa bits — the double sum is EXACT, in any order, in both
  * engines (the q114 lesson made structural: pick arithmetic whose
  * doubles can't differ, instead of pinning evaluation order).
  */
case class HllAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(m == 256, s"m=$m: register index is the first md5 hex byte")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(v.asInstanceOf[UTF8String].getBytes)
      val reg = Integer.parseInt(hex.substring(0, 2), 16)
      val tail = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      // ρ = 1 + leading zeros of the 32-bit tail; tail==0 → 33 (all 32
      // bits zero). bin-length identity: bitLen(tail>0) = 64 - nlz64.
      val rho =
        if (tail == 0L) 33
        else 33 - (64 - java.lang.Long.numberOfLeadingZeros(tail))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

object HllAgg {
  /** `hll_registers(item)` as a Column aggregate: the m=256 register
    * array (values 0..33). */
  def registers(item: Column, m: Int = 256): Column =
    bridge.column(
      HllAgg(bridge.expression(item), m).toAggregateExpression())
}
