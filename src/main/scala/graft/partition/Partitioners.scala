package graft.partition

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-path encoders, re-expressed as pure `Column` functions so
  * Catalyst can fold/prune them and `DataFrameWriter.partitionBy` can
  * reuse the same expressions at write time.
  *
  * Reference semantics:
  *  - Default:   `partition=<kafkaPartition>`
  *    (`/root/reference/src/main/java/io/confluent/connect/hdfs/partitioner/DefaultPartitioner.java:23-26`,
  *     behavior documented in `docs/hdfs_connector.rst:107-110`)
  *  - Field:     `<field>=<value>`
  *    (`partitioner/FieldPartitioner.java:23-26`)
  *  - TimeBased: floor(ts / partition.duration.ms) rendered through a
  *    date path format (`partitioner/TimeBasedPartitioner.java:23-26`,
  *    semantics in `partitioner/TimeBasedPartitionerTest.java:38-48`)
  *  - Daily / Hourly specializations
  *    (`partitioner/DailyPartitioner.java:23-26`, `HourlyPartitioner.java:23-26`)
  */
object Partitioners {

  /** `partition=<kafkaPartition>` — preserves source partitioning. */
  def defaultPartition(kafkaPartition: Column): Column =
    concat(lit("partition="), kafkaPartition.cast("string"))

  /** `<fieldName>=<value>` — one directory per distinct field value. */
  def fieldPartition(fieldName: String, value: Column): Column =
    concat(lit(s"$fieldName="), value.cast("string"))

  /** Start of the `durationMs`-wide bucket containing `ts`, as epoch millis.
    * This is the TimeBasedPartitioner bucketing function with the path
    * rendering factored out. */
  def timeBucketMillis(ts: Column, durationMs: Long): Column =
    (unix_millis(ts).cast("long") - pmod(unix_millis(ts), lit(durationMs))).as("bucket_ms")

  /** `year=YYYY/month=MM/day=dd` path (DailyPartitioner). */
  def dailyPath(ts: Column): Column =
    date_format(ts, "'year='yyyy'/month='MM'/day='dd")

  /** `year=YYYY/month=MM/day=dd/hour=HH` path (HourlyPartitioner). */
  def hourlyPath(ts: Column): Column =
    date_format(ts, "'year='yyyy'/month='MM'/day='dd'/hour='HH")

  /** TimeBased path with the reference's default-ish long format,
    * e.g. `year=2015/month=January/day=01/hour=2` —
    * vector from `partitioner/TimeBasedPartitionerTest.java:44-47`.
    * Renders in the session timezone, English month names. */
  def timeBasedPath(ts: Column): Column =
    concat(
      lit("year="), date_format(ts, "yyyy"),
      lit("/month="), date_format(ts, "MMMM"),
      lit("/day="), date_format(ts, "dd"),
      lit("/hour="), date_format(ts, "H"))

  /** Duration-bucket start in the LOCAL wall time of `tz` — the
    * reference's bucketing semantics (`TimeBasedPartitioner.java`
    * `getPartition`: the floor is applied to the zone-ADJUSTED
    * timestamp, then mapped back; an hourly bucket in a +05:30 zone
    * starts on the local hour, not the UTC one). Returns the bucket
    * start as a wall-clock timestamp (render it directly; the repo's
    * session-timezone convention is UTC). */
  def timeBucketLocal(ts: Column, durationMs: Long, tz: String): Column = {
    val local = from_utc_timestamp(ts, tz)
    timestamp_millis(unix_millis(local) - pmod(unix_millis(local), lit(durationMs)))
  }

  /** Fully parameterized TimeBased partitioner path — the reference's
    * configuration surface (`docs/configuration_options.rst:189-215`:
    * `partition.duration.ms`, `timezone`, `locale`; long path format).
    * Month names come from a plan-time per-locale name table because
    * `date_format` has no locale parameter; everything stays a foldable
    * Column expression. DST behavior matches the reference
    * (`TimeBasedPartitionerTest.java:51-60`): on fall-back the repeated
    * local hour renders the same path for both UTC instants. */
  def timeBasedPath(ts: Column, durationMs: Long, tz: String,
                    locale: java.util.Locale): Column = {
    val b = timeBucketLocal(ts, durationMs, tz)
    val monthNames = (1 to 12).map(m => lit(java.time.Month.of(m)
      .getDisplayName(java.time.format.TextStyle.FULL, locale)))
    concat(
      lit("year="), date_format(b, "yyyy"),
      lit("/month="), element_at(array(monthNames: _*), month(b)),
      lit("/day="), date_format(b, "dd"),
      lit("/hour="), date_format(b, "H"))
  }
}

/** The reference's pluggable `TimestampExtractor`s
  * (`/root/reference/src/main/java/io/confluent/connect/hdfs/TopicPartitionWriter.java:174-185`,
  * config `docs/configuration_options.rst:217-229`):
  * Wallclock = processing time, Record = the stream envelope timestamp,
  * RecordField = an epoch-millis field inside the value.
  */
object TimestampExtractors {
  /** Wallclock: processing time at evaluation. */
  def wallclock(): Column = current_timestamp()

  /** Record: the record/envelope timestamp column (Kafka record ts). */
  def record(tsCol: Column): Column = tsCol

  /** RecordField: epoch-millis long field inside the value struct. */
  def recordField(epochMillis: Column): Column = timestamp_millis(epochMillis.cast("long"))
}
