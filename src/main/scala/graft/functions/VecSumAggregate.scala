package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of `array<bigint>` vectors as ONE aggregate.
  *
  * The textbook way to sum vectors per group —
  * `posexplode(v)` → `groupBy(key, pos).agg(sum(x))` → re-assemble —
  * materializes rows × dims exploded records through the hash
  * aggregate (a 256-dim corpus pays 256× its row count) and then a
  * second aggregate to restore element order. This aggregate walks
  * each array once into a single long[] buffer: the map side reduces
  * every partition to one buffer per group, the shuffle carries
  * O(groups × dims) longs, and positions never leave their slots so
  * no re-sort exists. That is the update step of every Lloyd trainer
  * here ([[graft.operators.KMeans]]) at the row count it should be.
  *
  * Semantics: null arrays are ignored (the `sum` convention; an
  * all-null group yields an empty array); a null ELEMENT contributes
  * nothing to its slot — exactly what the replaced
  * posexplode→`sum(x)` route did, since `sum` skips nulls while the
  * row still counted (most vector columns are `containsNull = true`
  * by schema even though values never are). Ragged lengths within
  * one group are data corruption for every consumer of this engine
  * (vectors in a topic share a dimension) — refused loudly at the
  * first mismatching row. Overflow wraps like Spark's own long `sum`.
  */
case class VecSumI64(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_i64 needs array<bigint>, got ${dt.sql}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_i64"
  override def children: Seq[Expression] = Seq(child)

  // empty array = "no input yet": real inputs adopt their length on
  // first update, and a zero-dim vector is not a thing in this engine
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.isEmpty) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) fresh(i) = arr.getLong(i)
        i += 1
      }
      fresh
    } else {
      require(buf.length == n,
        s"vec_sum_i64: ragged vectors in one group (${buf.length} vs $n)")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getLong(i)
        i += 1
      }
      buf
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"vec_sum_i64: ragged vectors in one group (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumI64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumI64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
