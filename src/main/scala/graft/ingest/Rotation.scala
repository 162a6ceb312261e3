package graft.ingest

import java.time.{Instant, ZoneId}

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** File-rotation policies as declarative column algebra.
  *
  * The reference rotates a per-(topic,partition) temp file when any of
  * (a) `flush.size` records were buffered, (b) the extracted data
  * timestamp advanced `rotate.interval.ms` past the file's first record,
  * (c) a wallclock day-aligned schedule fired
  * (`/root/reference/src/main/java/io/confluent/connect/hdfs/TopicPartitionWriter.java:507-524`).
  * In Spark the same record→file assignment is a window expression, so
  * the whole policy stays inside Catalyst and distributes trivially.
  */
object Rotation {

  /** Size-based rotation (`flush.size`,
    * `TopicPartitionWriter.java:521`, test `avro/DataWriterAvroTest.java:63-77`):
    * the i-th record (0-based, in offset order within its partition)
    * lands in file `i / flushSize`. Requires a window only because
    * offsets need not start at 0 nor be dense. */
  def sizeFileIndex(partitionBy: Seq[Column], offset: Column, flushSize: Int): Column = {
    val rn = row_number().over(
      Window.partitionBy(partitionBy: _*).orderBy(offset.asc)) - 1
    (rn / flushSize).cast("long")
  }

  /** Data-time interval rotation (`rotate.interval.ms`,
    * `TopicPartitionWriter.java:516-519`): bucket index relative to the
    * first record's timestamp in the partition. */
  def intervalBucket(partitionBy: Seq[Column], tsMillis: Column, intervalMs: Long): Column = {
    val firstTs = min(tsMillis).over(Window.partitionBy(partitionBy: _*))
    ((tsMillis - firstTs) / lit(intervalMs)).cast("long")
  }

  /** Next scheduled-rotation fire time, day-aligned
    * (`rotate.schedule.interval.ms`, `TopicPartitionWriter.java:297-310`,
    * `DateTimeUtils.java:19-21`, semantics `DateTimeUtilsTest.java:23-41`):
    * the smallest `midnight + k*period` strictly after `now`. */
  def nextTimeAdjustedByDay(nowMs: Long, periodMs: Long, tz: ZoneId): Long = {
    val midnight = Instant.ofEpochMilli(nowMs).atZone(tz)
      .toLocalDate.atStartOfDay(tz).toInstant.toEpochMilli
    midnight + ((nowMs - midnight) / periodMs + 1) * periodMs
  }

  /** Column form of [[nextTimeAdjustedByDay]] in the session timezone
    * (UTC in this engine). */
  def nextRotateMillis(ts: Column, periodMs: Long): Column = {
    val nowMs = unix_millis(ts)
    val midnightMs = unix_millis(date_trunc("DAY", ts))
    midnightMs + ((nowMs - midnightMs) / lit(periodMs) + 1).cast("long") * lit(periodMs)
  }
}
