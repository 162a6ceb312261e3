package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.Compatibility

/** Schema-change-driven file rotation — the reference's evolution
  * semantics (`TopicPartitionWriter.java:353-365` applying
  * `SchemaUtils.shouldChangeSchema`, golden splits
  * `avro/DataWriterAvroTest.java:268-353`):
  *
  *  - BACKWARD/FULL: a newer version is adopted and forces a rotate;
  *    older records project up → adopted = running max of version.
  *  - FORWARD: an older version is adopted (newer project down) →
  *    adopted = running min.
  *  - NONE: any schema change rotates; nothing projects.
  *
  * Within a schema segment the `flush.size` record counter restarts
  * (the reference opens a fresh file on rotate), so file assignment is
  * (segment, recordInSegment / flushSize).
  *
  * Scale note: schema adoption is inherently sequential per Kafka
  * partition — the reference holds it as per-writer mutable state — so
  * this uses running windows over (part, off). One partition = one
  * task's window; that matches the reference's own concurrency model
  * (one writer per partition), and segments are usually few.
  */
object SchemaRotation {

  /** Adds `adopted_ver`, `seg_idx`, and `file_idx` columns. `ver` is
    * the record's schema version (or any monotone-comparable schema
    * id); for NONE, `schemaId` distinguishes schemas without ordering.
    * Versions must be non-null under ordered modes
    * (`SchemaUtils.java:43-47`) — enforced here with a typed error. */
  def withSchemaFileIndex(df: DataFrame, part: Column, off: Column, ver: Column,
                          compat: Compatibility, flushSize: Int): DataFrame = {
    val w = Window.partitionBy(part).orderBy(off)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val verChecked = compat match {
      case Compatibility.None => ver
      case _ =>
        // missing version under an ordered mode is an error, not null-skip
        when(ver.isNull, raise_error(
          lit("schema version is required under BACKWARD/FORWARD/FULL")))
          .otherwise(ver)
    }

    val adopted = compat match {
      case Compatibility.Backward | Compatibility.Full => max(verChecked).over(running)
      case Compatibility.Forward => min(verChecked).over(running)
      case Compatibility.None => verChecked
    }

    val withAdopted = df.withColumn("adopted_ver", adopted)
    // boundary = first record of the partition, or the adopted schema
    // id changed. Null-safe equality: under NONE a null schema id is a
    // legitimate distinct schema (schemaless JSON), and plain =!= would
    // neither rotate into nor out of it consistently.
    val boundary = row_number().over(w) === 1 ||
      !(col("adopted_ver") <=> lag(col("adopted_ver"), 1).over(w))
    val seg = withAdopted
      .withColumn("__b", when(boundary, 1L).otherwise(0L))
      .withColumn("seg_idx", sum(col("__b")).over(running) - 1)
      .drop("__b")
    val wSeg = Window.partitionBy(part, col("seg_idx")).orderBy(off)
    // (seg << 40) | sizeIdx: collision would need 2^40 files in one
    // schema segment of one partition — unreachable (that is ≥ 2^40 ×
    // flushSize records in a single Kafka partition)
    seg.withColumn("file_idx",
      shiftleft(col("seg_idx"), 40) +
        Rotation.longDiv((row_number().over(wSeg) - 1).cast("long"), lit(flushSize.toLong)))
  }

  /** Write with schema-rotation file assignment: segments rotate on
    * schema adoption, size rotation applies within each segment, and
    * every record is projected (by the caller) to the adopted schema.
    * Returns the commit manifest. */
  def write(df: DataFrame, part: Column, off: Column, ver: Column,
            compat: Compatibility, outDir: String, topic: String, flushSize: Int,
            pad: Int = FileNaming.DefaultZeroPadWidth): Seq[BatchWriter.CommittedFile] = {
    val assigned = withSchemaFileIndex(df, part, off, ver, compat, flushSize)
      .drop("adopted_ver", "seg_idx")
    BatchWriter.writeAssigned(assigned, outDir, topic, pad)
  }
}
