package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as an AGGREGATE, not a window.
  *
  * `row_number().over(partitionBy(key).orderBy(ord))` + `filter(rn<=k)`
  * — the textbook top-k-per-key — shuffles and sorts EVERY candidate
  * row. This aggregate keeps a k-bounded heap per group instead, so the
  * map side reduces each partition's contribution to at most k rows
  * before the exchange: the shuffle carries O(groups × k), not O(rows),
  * and nothing is ever globally sorted. That is the difference between
  * a candidate-scoring stage that survives 100 TB and one that doesn't.
  *
  * Semantics: collect (ord, id) pairs, return the k best as
  * `array<struct<ord,id>>` ranked by (ord DESC, id ASC) — ids break
  * ties, so results are deterministic and engine-portable. Null ord or
  * id inputs are ignored (the max_by convention); an empty group yields
  * an empty array.
  */
case class TopKPairs(
    ord: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  // worst-first ordering: the queue's head (max by this ordering) is
  // the element to EVICT — lowest ord, then largest id
  private val worstFirst: Ordering[(Long, Long)] =
    Ordering.fromLessThan { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != LongType || id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs needs (bigint, bigint, int), got " +
          s"${ord.dataType.sql}, ${id.dataType.sql}")
    // type check BEFORE the eval: a non-numeric foldable k must fail
    // analysis cleanly, not throw out of the Number cast
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs k must be an integer, got ${kExpr.dataType.sql}")
    else if (!kExpr.foldable || kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("topk_pairs k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"
  override def children: Seq[Expression] = Seq(ord, id, kExpr)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](worstFirst)

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buf.enqueue((o.asInstanceOf[Long], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
                     other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { p =>
      buf.enqueue(p)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    // under worstFirst, "less" means better — ascending sort IS best-first
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (o, i) => out.writeLong(o); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.enqueue((in.readLong(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
