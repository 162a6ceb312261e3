package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded KMV sketch as an AGGREGATE, not a distinct + window.
  *
  * The textbook k-minimum-values sketch build —
  * `.distinct()` on (key, h) then `row_number().over(partitionBy(key)
  * .orderBy(h)) <= k` — pays a full exchange of every distinct hash
  * AND a per-key sort of all of them, when only the k smallest ever
  * matter. This aggregate keeps a k-bounded ordered set per group
  * instead: the map side reduces each partition's contribution to at
  * most k values before the exchange, so the shuffle carries
  * O(groups × k) eight-byte rows regardless of corpus size. At 100 TB
  * the sketch build cost is the scan; the exchange is metadata.
  *
  * Semantics: the k smallest DISTINCT non-null values of the input,
  * returned as an ascending `array<bigint>`. Duplicates never occupy
  * a slot (the KMV contract is over the distinct hash set); an empty
  * group yields an empty array. Deterministic for any input order.
  */
case class MinKDistinct(
    value: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"min_k_distinct needs (bigint, int), got ${value.dataType.sql}")
    // type check BEFORE the eval: a non-numeric foldable k (a string
    // or date literal) must fail analysis cleanly, not throw a raw
    // ClassCastException out of the Number cast
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"min_k_distinct k must be an integer, got ${kExpr.dataType.sql}")
    else if (!kExpr.foldable || kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("min_k_distinct k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_distinct"
  override def children: Seq[Expression] = Seq(value, kExpr)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    // full-buffer fast path: values at or past the current k-th
    // smallest can neither enter the sketch nor displace anything
    if (buf.size < k || v < buf.last) {
      buf.add(v)
      if (buf.size > k) buf.remove(buf.last)
    }
  }

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = value.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), kExpr = newChildren(1))
}
