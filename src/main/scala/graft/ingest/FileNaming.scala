package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Offset-ranged committed-file naming:
  * `<topic>+<kafkaPartition>+<startOffset>+<endOffset>.<ext>` with
  * zero-padded offsets so lexicographic order == offset order.
  *
  * Reference: `/root/reference/src/main/java/io/confluent/connect/hdfs/FileUtils.java:77-100`,
  * pattern constants `HdfsSinkConnectorConstants.java:21-31`, pad width
  * config `docs/configuration_options.rst:125-131` (default 10),
  * committed-file filters `filter/CommittedFileFilter.java:25-32`.
  */
object FileNaming {

  val DefaultZeroPadWidth = 10

  /** `([a-zA-Z0-9\._\-]+)\+(\d+)\+(\d+)\+(\d+)(\.\w+)?` — group 4 is the
    * end offset (`FileUtils.java:142-149`). */
  val CommittedFilenameRegex: String =
    """([a-zA-Z0-9\._\-]+)\+(\d+)\+(\d+)\+(\d+)(\.\w+)?"""

  /** Whether a topic name stays inside the filename charset the
    * committed-name regex can parse back. A topic outside it (e.g.
    * containing '+') would WRITE fine but never match
    * [[CommittedFilenameRegex]], so offset restore would silently
    * restart at 0 — the exact duplicate-ingestion failure the encoded
    * names exist to prevent. Validate at entry, not at scan time. */
  def isValidTopicName(t: String): Boolean =
    t.nonEmpty && t.matches("[a-zA-Z0-9._\\-]+")

  /** Render a committed filename from its parts (Column form). */
  def encode(topic: Column, partition: Column, startOffset: Column,
             endOffset: Column, ext: String,
             pad: Int = DefaultZeroPadWidth): Column =
    format_string(s"%s+%d+%0${pad}d+%0${pad}d$ext",
      topic, partition.cast("long"), startOffset.cast("long"), endOffset.cast("long"))

  /** Scala form, used by the batch writer when renaming task output. */
  def encodeName(topic: String, partition: Int, startOffset: Long,
                 endOffset: Long, ext: String,
                 pad: Int = DefaultZeroPadWidth): String =
    ("%s+%d+%0" + pad + "d+%0" + pad + "d%s")
      .format(topic, partition, startOffset, endOffset, ext)

  /** End offset embedded in a committed filename (group 4), else null. */
  def extractEndOffset(name: Column): Column =
    nullif(regexp_extract(name, CommittedFilenameRegex, 4), lit("")).cast("long")

  /** Kafka partition embedded in a committed filename (group 2). */
  def extractPartition(name: Column): Column =
    nullif(regexp_extract(name, CommittedFilenameRegex, 2), lit("")).cast("int")

  /** Topic embedded in a committed filename (group 1). */
  def extractTopic(name: Column): Column =
    regexp_extract(name, CommittedFilenameRegex, 1)

  /** True iff `name` is a committed data file (anchored match; rejects
    * temp files like `<uuid>_tmp.parquet` — `FileUtils.java:66-75`). */
  def isCommitted(name: Column): Column =
    name.rlike("^" + CommittedFilenameRegex + "$")

  /** Committed files for one topic only (TopicCommittedFileFilter). */
  def isCommittedForTopic(name: Column, topic: String): Column =
    isCommitted(name) && extractTopic(name) === topic
}
