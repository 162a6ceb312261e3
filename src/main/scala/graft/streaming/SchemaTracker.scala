package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.Compatibility

/** Streaming schema-adoption tracker (A8 on the stream): the per-
  * (topic, partition) mutable current-schema state the reference keeps
  * inside `TopicPartitionWriter` (`:353-365`), held here in Spark's
  * managed state store via `flatMapGroupsWithState` — checkpointed,
  * recoverable, and partitioned by the same key the reference uses.
  *
  * Input: one event per record `(part, off, ver)`; output: one event
  * per ADOPTION (schema change that forces a rotate), carrying the
  * previous and new version — the stream of rotation points.
  */
object SchemaTracker {

  final case class SchemaEvent(part: Long, off: Long, ver: Int)
  final case class Adoption(part: Long, off: Long, prevVer: Int, newVer: Int)
  final case class TrackerState(currentVer: Int)

  def adoptions(events: Dataset[SchemaEvent], compat: Compatibility)
               (implicit spark: SparkSession): Dataset[Adoption] = {
    import spark.implicits._
    events.groupByKey(_.part)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part: Long, batch: Iterator[SchemaEvent], state: GroupState[TrackerState]) =>
          // offsets within one micro-batch group arrive unordered; the
          // reference consumes in offset order — restore it here
          val ordered = batch.toSeq.sortBy(_.off)
          var cur = state.getOption.map(_.currentVer)
          val out = Seq.newBuilder[Adoption]
          ordered.foreach { e =>
            val adopt = cur match {
              case None => true
              case Some(c) => compat match {
                case Compatibility.Backward | Compatibility.Full => e.ver > c
                case Compatibility.Forward => e.ver < c
                case Compatibility.None => e.ver != c
              }
            }
            if (adopt) {
              out += Adoption(part, e.off, cur.getOrElse(-1), e.ver)
              cur = Some(e.ver)
            }
          }
          cur.foreach(c => state.update(TrackerState(c)))
          out.result().iterator
      }
  }
}
