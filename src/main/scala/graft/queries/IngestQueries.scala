package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.{FileNaming, Rotation}
import graft.partition.{Partitioners, TimestampExtractors}
import graft.schema.SchemaEvolution
import graft.tables.Tables

/** The ingestion/commit-plane operator demos (SURVEY.md §2.A/§2.B) as
  * batch queries over the `events` table, each with a DuckDB oracle.
  *
  * `events` stands in for the Kafka stream: `event_id` ≈ offset, a
  * derived `event_id % 4` ≈ kafka partition, `ts` ≈ record timestamp,
  * `event_type` ≈ field-partition key (FIXTURES.md §2).
  */
object IngestQueries {

  private val P = QuerySpec.StreamPartitions // 4

  /** events + synthesized stream envelope columns (topic, part, off). */
  def stream(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      lit("events").as("topic"),
      pmod(col("event_id"), lit(P.toLong)).as("part"),
      col("event_id").as("off"),
      col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))

  /** Committed filenames derived from size-based rotation at flush=100 —
    * shared by filename_encode / extract_offset / max_offset_per_partition. */
  private def committedFiles(spark: SparkSession, dir: String): DataFrame = {
    val sized = Rotation.withSizeFileIndex(
      stream(spark, dir), Seq(col("part")), col("off"), 100)
    sized.groupBy(col("part"), col("file_idx"))
      .agg(min(col("off")).as("start_offset"), max(col("off")).as("end_offset"))
      .select(
        FileNaming.encode(lit("events"), col("part"),
          col("start_offset"), col("end_offset"), ".parquet").as("filename"),
        col("part"), col("file_idx"), col("start_offset"), col("end_offset"))
  }

  /** DuckDB CTE mirroring [[committedFiles]]. */
  private val committedFilesSql =
    s"""WITH e AS (SELECT event_id % $P AS part, event_id AS off FROM events),
       |f AS (SELECT part, off,
       |        (off - min(off) OVER (PARTITION BY part)) // 100 AS file_idx
       |      FROM e),
       |c AS (SELECT part, file_idx,
       |        min(off) AS start_offset, max(off) AS end_offset,
       |        printf('events+%d+%010d+%010d.parquet', part, min(off), max(off)) AS filename
       |      FROM f GROUP BY part, file_idx)""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // A1 — Kafka source scan (batch analog): projection + pushed filter.
    QuerySpec("scan_events",
      (s, d) => Tables.events(s, d)
        .filter(col("value") > 100)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE value > 100 ORDER BY event_id""".stripMargin)),

    // A2 — per-partition routing: demux counts by (topic, partition).
    QuerySpec("route_by_partition",
      (s, d) => stream(s, d).groupBy(col("part"))
        .agg(count(lit(1)).as("n"), min(col("off")).as("min_off"),
          max(col("off")).as("max_off"))
        .orderBy(col("part")),
      Some(s"""SELECT event_id % $P AS part, count(*) AS n,
              |  min(event_id) AS min_off, max(event_id) AS max_off
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A3 — DefaultPartitioner: partition=<kafkaPartition>.
    QuerySpec("partition_default",
      (s, d) => stream(s, d)
        .groupBy(Partitioners.defaultPartition(col("part")).as("encoded"))
        .agg(count(lit(1)).as("n")).orderBy(col("encoded")),
      Some(s"""SELECT concat('partition=', (event_id % $P)::VARCHAR) AS encoded,
              |  count(*) AS n
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A4 — FieldPartitioner: <field>=<value> per distinct value.
    QuerySpec("partition_field",
      (s, d) => stream(s, d)
        .groupBy(Partitioners.fieldPartition("event_type", col("event_type")).as("encoded"))
        .agg(count(lit(1)).as("n")).orderBy(col("encoded")),
      Some("""SELECT concat('event_type=', event_type) AS encoded, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A5 — TimeBasedPartitioner: floor(ts / duration) buckets (2h).
    QuerySpec("partition_time_bucket",
      (s, d) => stream(s, d)
        .groupBy(Partitioners.timeBucketMillis(col("ts"), 7200000L).as("bucket_ms"))
        .agg(count(lit(1)).as("n")).orderBy(col("bucket_ms")),
      Some("""SELECT epoch_ms(ts) - epoch_ms(ts) % 7200000 AS bucket_ms, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A6 — DailyPartitioner path.
    QuerySpec("partition_daily",
      (s, d) => stream(s, d)
        .groupBy(Partitioners.dailyPath(col("ts")).as("path"))
        .agg(count(lit(1)).as("n")).orderBy(col("path")),
      Some("""SELECT strftime(ts, 'year=%Y/month=%m/day=%d') AS path, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A6 — HourlyPartitioner path.
    QuerySpec("partition_hourly",
      (s, d) => stream(s, d)
        .groupBy(Partitioners.hourlyPath(col("ts")).as("path"))
        .agg(count(lit(1)).as("n")).orderBy(col("path")),
      Some("""SELECT strftime(ts, 'year=%Y/month=%m/day=%d/hour=%H') AS path, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A5+ — parameterized TimeBasedPartitioner: 2h buckets floored on
    // the America/Los_Angeles wall clock (the reference's zone-adjusted
    // getPartition), rendered in the long month-name format.
    QuerySpec("partition_time_zoned",
      (s, d) => stream(s, d)
        .groupBy(Partitioners.timeBasedPath(col("ts"), 7200000L,
          "America/Los_Angeles", java.util.Locale.ENGLISH).as("path"))
        .agg(count(lit(1)).as("n")).orderBy(col("path")),
      Some("""WITH wall AS (
             |  SELECT timezone('America/Los_Angeles', ts AT TIME ZONE 'UTC') AS w
             |  FROM events),
             |raw AS (SELECT make_timestamp(
             |    (epoch_ms(w) - epoch_ms(w) % 7200000) * 1000) AS bk0 FROM wall),
             |-- Joda-lenient spring-forward resolution: a bucket start
             |-- landing in the skipped 02:00-03:00 hour (US rule
             |-- post-2007: second Sunday in March) renders one hour
             |-- later, mirroring the engine's jodaBucketWall /
             |-- convertLocalToUTC(.., false)
             |b AS (SELECT CASE WHEN month(bk0) = 3 AND hour(bk0) = 2
             |      AND dayofweek(bk0) = 0 AND day(bk0) BETWEEN 8 AND 14
             |    THEN bk0 + INTERVAL 1 HOUR ELSE bk0 END AS bk FROM raw)
             |SELECT concat('year=', strftime(bk, '%Y'),
             |    '/month=', monthname(bk),
             |    '/day=', strftime(bk, '%d'),
             |    '/hour=', CAST(hour(bk) AS VARCHAR)) AS path,
             |  count(*) AS n
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A5++ — Moscow-class zone-name rendering (r15): Joda `z` over a
    // zone whose offset→name map is ambiguous across rule changes
    // (Europe/Moscow: +03/+04 each carried MSK and MSD) — rendered by
    // the era-keyed plan-time chain (Partitioners.zoneNameEras)
    // instead of refusing. Deterministic day-grain instants spanning
    // 2010→2015.5 cross the 2010 DST window, the 2011 permanent-+04
    // change, and the 2014 permanent-+03 change; the oracle re-derives
    // the names from the pinned tzdb transition instants.
    QuerySpec("partition_time_moscow",
      (s, d) => stream(s, d)
        .select(timestamp_millis(lit(1262304000000L) +
          pmod(col("off"), lit(2000L)) * lit(86400000L)).as("mts"))
        .groupBy(Partitioners.jodaPath(col("mts"), 3600000L,
          "Europe/Moscow", java.util.Locale.ENGLISH, "yyyy-MM'/'z")
          .as("path"))
        .agg(count(lit(1)).as("n")).orderBy(col("path")),
      Some("""WITH m AS (SELECT 1262304000000 + (event_id % 2000) * 86400000 AS t
             |  FROM events),
             |-- Europe/Moscow transition instants (UTC ms, tzdb):
             |-- 2010-03-27T23:00Z +04 MSD / 2010-10-30T23:00Z +03 MSK /
             |-- 2011-03-26T23:00Z +04 MSK / 2014-10-25T22:00Z +03 MSK
             |o AS (SELECT t,
             |    CASE WHEN (t >= 1269730800000 AND t < 1288479600000)
             |           OR (t >= 1301180400000 AND t < 1414274400000)
             |      THEN 14400000 ELSE 10800000 END AS offms,
             |    CASE WHEN t >= 1269730800000 AND t < 1288479600000
             |      THEN 'MSD' ELSE 'MSK' END AS zname
             |  FROM m),
             |w AS (SELECT make_timestamp((t + offms) * 1000) AS wall, zname
             |  FROM o)
             |SELECT concat(strftime(wall, '%Y-%m'), '/', zname) AS path,
             |  count(*) AS n
             |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A7 — RecordField timestamp extractor: epoch-ms field → timestamp.
    QuerySpec("ts_extract_field",
      (s, d) => stream(s, d).select(col("off").as("event_id"),
          unix_millis(TimestampExtractors.recordField(unix_millis(col("ts")))).as("ts_ms"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, epoch_ms(ts) AS ts_ms FROM events
             |ORDER BY event_id""".stripMargin)),

    // A8 — schema-change detector: lag(schema_hash) over offset order
    // per partition (md5(event_type) stands in for the value schema).
    QuerySpec("schema_change_detect",
      (s, d) => {
        val h = stream(s, d).select(col("part"), col("off"),
          md5(col("event_type").cast("binary")).as("hash"))
        val w = Window.partitionBy(col("part")).orderBy(col("off"))
        h.withColumn("prev_hash", lag(col("hash"), 1).over(w))
          .filter(col("prev_hash").isNotNull && col("prev_hash") =!= col("hash"))
          .select(col("part"), col("off"), col("prev_hash"), col("hash").as("new_hash"))
          .orderBy(col("part"), col("off"))
      },
      Some(s"""WITH h AS (SELECT event_id % $P AS part, event_id AS off,
              |    md5(event_type) AS hash FROM events),
              |l AS (SELECT part, off, hash,
              |    lag(hash) OVER (PARTITION BY part ORDER BY off) AS prev
              |  FROM h)
              |SELECT part, off, prev AS prev_hash, hash AS new_hash FROM l
              |WHERE prev IS NOT NULL AND prev <> hash
              |ORDER BY part, off""".stripMargin)),

    // A9 — schema projection onto a target schema (missing field
    // defaulted, extra fields dropped, casts applied).
    QuerySpec("schema_project",
      (s, d) => {
        import org.apache.spark.sql.types._
        val target = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("severity", IntegerType)))
        SchemaEvolution.project(Tables.events(s, d), target,
          defaults = Map("severity" -> 0)).orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type, 0 AS severity FROM events
             |ORDER BY event_id""".stripMargin)),

    // A11 — size-based rotation: flush.size=100 file assignment.
    QuerySpec("rotate_size_files",
      (s, d) => Rotation.withSizeFileIndex(
          stream(s, d), Seq(col("part")), col("off"), 100)
        .groupBy(col("part"), col("file_idx"))
        .agg(count(lit(1)).as("n"), min(col("off")).as("start_offset"),
          max(col("off")).as("end_offset"))
        .orderBy(col("part"), col("file_idx")),
      Some(s"""WITH e AS (SELECT event_id % $P AS part, event_id AS off FROM events),
              |f AS (SELECT part, off,
              |    (off - min(off) OVER (PARTITION BY part)) // 100 AS file_idx FROM e)
              |SELECT part, file_idx, count(*) AS n,
              |  min(off) AS start_offset, max(off) AS end_offset
              |FROM f GROUP BY part, file_idx ORDER BY part, file_idx""".stripMargin),
      bench = true),

    // A12 — data-time interval rotation (1h buckets from first ts).
    QuerySpec("rotate_interval_buckets",
      (s, d) => Rotation.withIntervalBucket(
          stream(s, d), Seq(col("part")), unix_millis(col("ts")), 3600000L)
        .groupBy(col("part"), col("bucket_idx"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("part"), col("bucket_idx")),
      Some(s"""WITH e AS (SELECT event_id % $P AS part, epoch_ms(ts) AS ts_ms FROM events),
              |f AS (SELECT part,
              |    (ts_ms - min(ts_ms) OVER (PARTITION BY part)) // 3600000 AS bucket_idx
              |  FROM e)
              |SELECT part, bucket_idx, count(*) AS n
              |FROM f GROUP BY part, bucket_idx ORDER BY part, bucket_idx""".stripMargin)),

    // A13 — scheduled rotation: day-aligned next fire time (period 3h).
    QuerySpec("next_rotate_schedule",
      (s, d) => stream(s, d).select(col("off").as("event_id"),
          Rotation.nextRotateMillis(col("ts"), 10800000L).as("next_fire_ms"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  epoch_ms(date_trunc('day', ts))
             |  + ((epoch_ms(ts) - epoch_ms(date_trunc('day', ts))) // 10800000 + 1)
             |    * 10800000 AS next_fire_ms
             |FROM events ORDER BY event_id""".stripMargin)),

    // A15 — offset-ranged committed filename encoding.
    QuerySpec("filename_encode",
      (s, d) => committedFiles(s, d)
        .orderBy(col("part"), col("file_idx")),
      Some(s"""$committedFilesSql
              |SELECT filename, part, file_idx, start_offset, end_offset
              |FROM c ORDER BY part, file_idx""".stripMargin),
      bench = true),

    // B9 — offset extraction back out of committed filenames.
    QuerySpec("extract_offset",
      (s, d) => committedFiles(s, d).select(
          col("filename"),
          FileNaming.extractTopic(col("filename")).as("topic"),
          FileNaming.extractPartition(col("filename")).as("part_extracted"),
          FileNaming.extractEndOffset(col("filename")).as("end_extracted"))
        .orderBy(col("filename")),
      Some(s"""$committedFilesSql
              |SELECT filename,
              |  regexp_extract(filename, '([a-zA-Z0-9\\._\\-]+)\\+(\\d+)\\+(\\d+)\\+(\\d+)(\\.\\w+)?', 1) AS topic,
              |  regexp_extract(filename, '([a-zA-Z0-9\\._\\-]+)\\+(\\d+)\\+(\\d+)\\+(\\d+)(\\.\\w+)?', 2)::INT AS part_extracted,
              |  regexp_extract(filename, '([a-zA-Z0-9\\._\\-]+)\\+(\\d+)\\+(\\d+)\\+(\\d+)(\\.\\w+)?', 4)::BIGINT AS end_extracted
              |FROM c ORDER BY filename""".stripMargin)),

    // B8 — committed-file filter: committed names pass, temp names drop.
    QuerySpec("filter_committed_files",
      (s, d) => {
        val named = stream(s, d).select(
          when(pmod(col("off"), lit(2L)) === 0,
            FileNaming.encode(lit("events"), col("part"), col("off"), col("off"), ".parquet"))
          .otherwise(format_string("%08x_tmp.parquet", col("off"))).as("name"))
        named.filter(FileNaming.isCommitted(col("name"))).orderBy(col("name"))
      },
      Some(s"""WITH n AS (SELECT CASE WHEN event_id % 2 = 0
              |    THEN printf('events+%d+%010d+%010d.parquet',
              |                event_id % $P, event_id, event_id)
              |    ELSE printf('%08x_tmp.parquet', event_id) END AS name
              |  FROM events)
              |SELECT name FROM n
              |WHERE regexp_matches(name, '^([a-zA-Z0-9\\._\\-]+)\\+(\\d+)\\+(\\d+)\\+(\\d+)(\\.\\w+)?$$')
              |ORDER BY name""".stripMargin)),

    // A21/B11 — offset restore: max committed end offset per partition.
    QuerySpec("max_offset_per_partition",
      (s, d) => committedFiles(s, d)
        .groupBy(FileNaming.extractPartition(col("filename")).as("part_extracted"))
        .agg(max(FileNaming.extractEndOffset(col("filename"))).as("max_offset"))
        .orderBy(col("part_extracted")),
      Some(s"""$committedFilesSql
              |SELECT
              |  regexp_extract(filename, '([a-zA-Z0-9\\._\\-]+)\\+(\\d+)\\+(\\d+)\\+(\\d+)(\\.\\w+)?', 2)::INT AS part_extracted,
              |  max(regexp_extract(filename, '([a-zA-Z0-9\\._\\-]+)\\+(\\d+)\\+(\\d+)\\+(\\d+)(\\.\\w+)?', 4)::BIGINT) AS max_offset
              |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B3 — JSON round-trip: parse a field out of the json payload and
    // re-encode it (schemaless JSON path of the reference).
    QuerySpec("json_roundtrip",
      (s, d) => {
        val k = get_json_object(col("props"), "$.k").cast("int")
        Tables.events(s, d).select(col("event_id"), k.as("k"),
            to_json(struct(k.as("k"))).as("j"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  regexp_extract(props, '"k": (\d+)', 1)::INT AS k,
             |  printf('{"k":%d}', regexp_extract(props, '"k": (\d+)', 1)::INT) AS j
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- Transactional-log sink round-trip: ingest the event stream
    //      through CommitLog (write → one atomic version per commit →
    //      log-based compaction swap → vacuum), then aggregate the
    //      SNAPSHOT read. The oracle computes the same aggregate from
    //      the raw table — equality proves the full
    //      write/compact/vacuum/replay cycle is lossless and
    //      duplicate-free. ----
    QuerySpec("commitlog_roundtrip",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events", flushSize = 500)
        graft.ingest.CommitLog.compactLogged(s, dir, "events",
          targetRecords = 4000)
        graft.ingest.CommitLog.vacuum(s, dir, "events", graceMs = 0)
        val agg = graft.ingest.CommitLog.read(s, dir, "events")
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n"), min(col("off")).as("min_off"),
            max(col("off")).as("max_off"),
            sum(col("user_id")).as("sum_users"))
          .orderBy(col("part"))
        // materialize the per-partition result (4 rows) so the temp
        // ingest dir can be reclaimed before returning
        val rows = agg.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), agg.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, count(*) AS n,
              |  min(event_id) AS min_off, max(event_id) AS max_off,
              |  CAST(sum(user_id) AS BIGINT) AS sum_users
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- The LOGICAL change feed across a compaction: ingest two
    //      halves as two log versions, compact (total file churn),
    //      then diffRows(v0 → HEAD) must report EXACTLY the second
    //      half as added and nothing removed — the swap's rewrite of
    //      every v0 file contributes zero rows by bag-except
    //      invariance. This is the pinned-to-pinned incremental
    //      consumer (branch points, historical replays) the
    //      append-feed readAddedSince cannot serve. ----
    QuerySpec("commitlog_diff_feed",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-diff-q").toString
        val in = stream(s, d).drop("topic", "ts")
        val cut = in.agg(max(col("off"))).head().getLong(0) / 2
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") <= cut), dir, "events", flushSize = 500)
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") > cut), dir, "events", flushSize = 500)
        graft.ingest.CommitLog.compactLogged(s, dir, "events",
          targetRecords = 1L << 40)
        val head = graft.ingest.CommitLog.latestVersion(s, dir, "events")
        val (added, removed) =
          graft.ingest.CommitLog.diffRows(s, dir, "events", 0L, head)
        val agg = added.groupBy(col("part"))
          .agg(count(lit(1)).as("n_added"), min(col("off")).as("min_off"),
            max(col("off")).as("max_off"))
          .crossJoin(broadcast(removed.agg(count(lit(1)).as("n_removed"))))
          .orderBy(col("part"))
        val rows = agg.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), agg.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, count(*) AS n_added,
              |  min(event_id) AS min_off, max(event_id) AS max_off,
              |  0::BIGINT AS n_removed
              |FROM events
              |WHERE event_id > (SELECT max(event_id) // 2 FROM events)
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Derived topic through the log: ingest the stream in two
    //      halves, RELAY each increment through a row-local transform
    //      into a second logged topic (progress recovered from the
    //      destination's own committed filenames — no sidecar state),
    //      then read the derivative. The oracle applies the same
    //      transform to the raw table: equality proves the two
    //      incremental relays composed to exactly one full pass, no
    //      row dropped or doubled across the catch-up boundary. ----
    QuerySpec("commitlog_relay",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-relay-q").toString
        val in = stream(s, d).drop("topic", "ts")
        val cut = in.agg(max(col("off"))).head().getLong(0) / 2
        val clean: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          df => df.select(col("part"), col("off"), col("user_id"),
            upper(col("event_type")).as("event_type"))
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") <= cut), dir, "events", flushSize = 500)
        graft.ingest.CommitLog.relay(s, dir, "events", "clean", clean, 500)
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") > cut), dir, "events", flushSize = 500)
        graft.ingest.CommitLog.relay(s, dir, "events", "clean", clean, 500)
        val out = graft.ingest.CommitLog.read(s, dir, "clean")
          .groupBy(col("part"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
          .orderBy(col("part"), col("event_type"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, upper(event_type) AS event_type,
              |  count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_users
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- DML CASCADE to a derived topic (the right-to-be-forgotten
    //      step relay's append feed cannot carry): build a FILTERING
    //      derivative, then erase one user cohort and redact two more
    //      at the SOURCE, and cascade the whole swap range with
    //      relayDml — erased keys leave the derivative, updated keys
    //      re-transform (one lands on the filter and becomes a
    //      delete), rows the derivative never held stay absent. The
    //      oracle recomputes the derivative from the raw table and the
    //      same CASE logic, never seeing the erased rows: equality
    //      proves the cascade is exact, not just plausible. ----
    QuerySpec("commitlog_relay_dml",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-relaydml-q").toString
        val in = stream(s, d).drop("topic", "ts", "value", "props")
        val clean: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          df => df.filter(col("event_type") =!= "view")
            .select(col("part"), col("off"), col("user_id"),
              upper(col("event_type")).as("event_type"))
        graft.ingest.CommitLog.writeLogged(in, dir, "events", flushSize = 500)
        val from = graft.ingest.CommitLog.latestVersion(s, dir, "events")
        graft.ingest.CommitLog.relay(s, dir, "events", "clean", clean, 500)
        // source DML batch: erasure + redaction + a filter-landing update
        graft.ingest.CommitLog.deleteWhere(s, dir, "events",
          pmod(col("user_id"), lit(7L)) === 0L)
        graft.ingest.CommitLog.updateWhere(s, dir, "events",
          pmod(col("user_id"), lit(5L)) === 0L,
          Map("event_type" -> lit("redacted")))
        graft.ingest.CommitLog.updateWhere(s, dir, "events",
          pmod(col("user_id"), lit(11L)) === 0L,
          Map("event_type" -> lit("view")))
        val to = graft.ingest.CommitLog.latestVersion(s, dir, "events")
        graft.ingest.CommitLog.relayDml(s, dir, "events", "clean", clean,
          from, to)
        val out = graft.ingest.CommitLog.read(s, dir, "clean")
          .groupBy(col("part"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
          .orderBy(col("part"), col("event_type"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      // present in the derivative iff the ORIGINAL row passed the
      // filter (it was relayed) AND the post-DML transform output
      // still passes (the cascade did not delete it)
      Some(s"""WITH src AS (SELECT event_id % ${P} AS part, user_id,
              |    event_type AS orig_type,
              |    CASE WHEN user_id % 11 = 0 THEN 'view'
              |         WHEN user_id % 5 = 0 THEN 'redacted'
              |         ELSE event_type END AS final_type
              |  FROM events WHERE user_id % 7 <> 0)
              |SELECT part, upper(final_type) AS event_type,
              |  count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_users
              |FROM src WHERE orig_type <> 'view' AND final_type <> 'view'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Row-level DELETE through the log (the erasure primitive:
    //      right-to-be-forgotten / contamination retraction on
    //      ALREADY-committed data): ingest the stream, erase one
    //      "user's" rows with deleteWhere — only files holding matches
    //      rewrite, one atomic swap version, resume coverage pinned —
    //      then aggregate the snapshot. The oracle computes the same
    //      aggregate from the raw table minus the predicate: equality
    //      proves the rewrite erased exactly the matching rows and
    //      nothing else. ----
    QuerySpec("commitlog_delete_where",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-del-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events", flushSize = 500)
        graft.ingest.CommitLog.deleteWhere(s, dir, "events",
          pmod(col("user_id"), lit(7L)) === 0L)
        val agg = graft.ingest.CommitLog.read(s, dir, "events")
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n"), min(col("off")).as("min_off"),
            max(col("off")).as("max_off"),
            sum(col("user_id")).as("sum_users"))
          .orderBy(col("part"))
        val rows = agg.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), agg.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, count(*) AS n,
              |  min(event_id) AS min_off, max(event_id) AS max_off,
              |  CAST(sum(user_id) AS BIGINT) AS sum_users
              |FROM events WHERE user_id % 7 <> 0
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Row-level UPDATE through the log (in-place redaction of
    //      ALREADY-committed content, offsets untouched): ingest,
    //      scrub one "user's" payloads with updateWhere, read the
    //      snapshot back. The oracle applies the same CASE WHEN to
    //      the raw table — equality proves exactly the matching rows
    //      changed, everything else (rows, offsets, ride-along
    //      payloads in rewritten files) is byte-stable. ----
    QuerySpec("commitlog_update_where",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-upd-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events", flushSize = 500)
        graft.ingest.CommitLog.updateWhere(s, dir, "events",
          pmod(col("user_id"), lit(7L)) === 0L,
          Map("props" -> lit("{\"redacted\":true}"),
            "value" -> lit(0.0)))
        val out = graft.ingest.CommitLog.read(s, dir, "events")
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
            count(when(col("props") === "{\"redacted\":true}", 1)).as("n_redacted"))
          .orderBy(col("part"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, count(*) AS n,
              |  CAST(sum(CAST(CASE WHEN user_id % 7 = 0 THEN 0.0
              |    ELSE value END AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
              |  count(*) FILTER (user_id % 7 = 0) AS n_redacted
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- DATA SKIPPING over the log (the stats sidecar plane):
    //      ingest the stream, install per-file min/max/null stats on
    //      (off, event_type, value), then answer a selective
    //      predicate through FileStats.readPruned — files whose
    //      column ranges refute the predicate never open (at 100 TB
    //      this is what keeps a selective read or a deleteWhere from
    //      touching every file; the pruning RATIO and conservatism
    //      are pinned in FileStatsSpec). The oracle runs the same
    //      filter over the raw table: equality proves pruning refuted
    //      only files that could not match. ----
    QuerySpec("commitlog_stats_prune",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-stats-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events", flushSize = 500)
        graft.ingest.FileStats.install(s, dir, "events",
          Seq("off", "event_type", "value"))
        val sel = graft.ingest.FileStats.readPruned(s, dir, "events",
          col("off").between(1000L, 1400L) && col("event_type") =!= "view")
        val agg = sel.groupBy(col("part"))
          .agg(count(lit(1)).as("n"), min(col("off")).as("min_off"),
            max(col("off")).as("max_off"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("sum_value"))
          .orderBy(col("part"))
        val rows = agg.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), agg.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, count(*) AS n,
              |  min(event_id) AS min_off, max(event_id) AS max_off,
              |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              |    AS sum_value
              |FROM events
              |WHERE event_id BETWEEN 1000 AND 1400 AND event_type <> 'view'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- METADATA-ONLY aggregates from the stats plane: three
    //      commit-time-statted publishes (writeLogged's statsCols
    //      path — coverage lands with each publish, no install call),
    //      then count / per-column min / max / null-count answered
    //      from the plane ALONE — zero data files open, the
    //      lakehouse count(*)/min/max shortcut. The oracle computes
    //      the same extrema from the raw table: equality proves the
    //      per-file stats and their merge are exact, not just
    //      conservative. ----
    QuerySpec("commitlog_stats_agg",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-sagg-q").toString
        val in = stream(s, d).drop("topic", "ts")
        val sc = Seq("off", "user_id", "event_type", "value")
        for (i <- 0 until 3)
          graft.ingest.CommitLog.writeLogged(
            in.filter(pmod(col("off"), lit(3L)) === i.toLong), dir, "events",
            flushSize = 500, statsCols = sc)
        val (_, stats) = graft.ingest.FileStats.metaAggregates(s, dir, "events")
          .getOrElse(throw new IllegalStateException(
            "full commit-time coverage expected"))
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("col",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("llo",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lhi",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dlo",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("dhi",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("slo",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("shi",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("nnull",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("nrow",
            org.apache.spark.sql.types.LongType, nullable = false)))
        val rows = stats.toSeq.sortBy(_._1).map { case (c, st) =>
          org.apache.spark.sql.Row(c,
            st.lLo.map(java.lang.Long.valueOf).orNull,
            st.lHi.map(java.lang.Long.valueOf).orNull,
            st.dLo.map(java.lang.Double.valueOf).orNull,
            st.dHi.map(java.lang.Double.valueOf).orNull,
            st.sLo.orNull, st.sHi.orNull, st.nNull, st.nRow)
        }
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema)
      },
      Some("""SELECT 'event_type' AS col, NULL::BIGINT AS llo,
             |  NULL::BIGINT AS lhi, NULL::DOUBLE AS dlo,
             |  NULL::DOUBLE AS dhi, min(event_type) AS slo,
             |  max(event_type) AS shi,
             |  count(*) FILTER (event_type IS NULL) AS nnull,
             |  count(*) AS nrow FROM events
             |UNION ALL SELECT 'off', min(event_id), max(event_id),
             |  NULL, NULL, NULL, NULL,
             |  count(*) FILTER (event_id IS NULL), count(*) FROM events
             |UNION ALL SELECT 'user_id', min(user_id), max(user_id),
             |  NULL, NULL, NULL, NULL,
             |  count(*) FILTER (user_id IS NULL), count(*) FROM events
             |UNION ALL SELECT 'value', NULL, NULL,
             |  min(value), max(value), NULL, NULL,
             |  count(*) FILTER (value IS NULL), count(*) FROM events
             |ORDER BY col""".stripMargin)),

    // ---- Z-ORDER CLUSTERING (the lakehouse OPTIMIZE ZORDER): rewrite
    //      an ingest-ordered topic into a NEW topic laid out along the
    //      Morton curve of (user_id, value) — equi-depth bucket ranks
    //      interleaved, one range shuffle + per-partition sort, the
    //      skipping plane for both columns installed in the same
    //      atomic publish (ZOrder.cluster). The result proves both
    //      halves of the story: the per-src_part aggregates over the
    //      clustered copy must equal the raw table (the rewrite lost,
    //      duplicated, and reordered-across-coordinates nothing — the
    //      provenance columns carry the original addresses), and the
    //      same aggregates through FileStats.readPruned with a
    //      two-column range predicate must equal the filtered raw
    //      table (file skipping refutes FILES, never rows). ----
    QuerySpec("commitlog_zorder_cluster",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-zorder-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events",
          flushSize = 500)
        graft.ingest.ZOrder.cluster(s, dir, "events", "events_z",
          Seq("user_id", "value"), flushSize = 400, numParts = 4)
        val z = graft.ingest.CommitLog.read(s, dir, "events_z")
        def shape(df: org.apache.spark.sql.DataFrame, tag: Long) =
          df.groupBy(col("src_part"))
            .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"),
              min(col("src_off")).as("min_off"),
              max(col("src_off")).as("max_off"))
            .select(lit(tag).as("leg"), col("src_part"), col("n"),
              col("sum_users"), col("min_off"), col("max_off"))
        val pred = col("user_id") < 40L && col("value") < 100.0
        // generation-0 frames resolve their file lists NOW (snapshot
        // and plane reads are eager), so they keep reading the old
        // generation across the swap below — time-travel semantics
        val pruned1 = graft.ingest.FileStats.readPruned(s, dir,
          "events_z", pred)
        // DML on the SOURCE, then one recluster tick: the clustered
        // copy must converge to the erased source atomically
        graft.ingest.CommitLog.deleteWhere(s, dir, "events",
          pmod(col("user_id"), lit(31L)) === 5L)
        graft.ingest.ZOrder.recluster(s, dir, "events", "events_z",
          flushSize = 400, numParts = 4)
        val z2 = graft.ingest.CommitLog.read(s, dir, "events_z")
        val out = shape(z, 0L).unionAll(shape(pruned1, 1L))
          .unionAll(shape(z2, 2L))
          .unionAll(shape(graft.ingest.FileStats.readPruned(s, dir,
            "events_z", pred), 3L))
          .orderBy(col("leg"), col("src_part"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      Some(s"""SELECT 0 AS leg, event_id % ${P} AS src_part,
              |  count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_users,
              |  min(event_id) AS min_off, max(event_id) AS max_off
              |FROM events GROUP BY 2
              |UNION ALL
              |SELECT 1, event_id % ${P}, count(*),
              |  CAST(sum(user_id) AS BIGINT), min(event_id), max(event_id)
              |FROM events WHERE user_id < 40 AND value < 100.0
              |GROUP BY 2
              |UNION ALL
              |SELECT 2, event_id % ${P}, count(*),
              |  CAST(sum(user_id) AS BIGINT), min(event_id), max(event_id)
              |FROM events WHERE user_id % 31 <> 5
              |GROUP BY 2
              |UNION ALL
              |SELECT 3, event_id % ${P}, count(*),
              |  CAST(sum(user_id) AS BIGINT), min(event_id), max(event_id)
              |FROM events WHERE user_id % 31 <> 5
              |  AND user_id < 40 AND value < 100.0
              |GROUP BY 2
              |ORDER BY leg, src_part""".stripMargin)),

    // ---- BLOOM FILE SKIPPING: point predicates on high-cardinality
    //      columns fall inside every file's min/max range, so the
    //      stats plane keeps everything — the per-file Bloom plane
    //      (FileBloom: k xxhash64 positions per value, sparse 64-bit
    //      words, one bit_or group-by to build, pushdown-probed) is
    //      what refutes files for `user_id = x`. The result runs the
    //      SAME aggregates through FileBloom.readPruned for an
    //      equality and an IN-list (one member nonexistent) — content
    //      must equal the raw filtered table regardless of which
    //      files the filters refuted (no false negatives ever; false
    //      positives only cost I/O). ----
    QuerySpec("commitlog_bloom_prune",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-bloom-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events",
          flushSize = 500, bloomCols = Seq("user_id", "event_type"))
        def shape(pred: org.apache.spark.sql.Column, tag: Long) =
          graft.ingest.FileBloom.readPruned(s, dir, "events", pred)
            .agg(count(lit(1)).as("n"),
              coalesce(min(col("off")), lit(-1L)).as("min_off"),
              coalesce(max(col("off")), lit(-1L)).as("max_off"),
              coalesce(sum(col("user_id")), lit(0L)).as("sum_users"))
            .select(lit(tag).as("leg"), col("n"), col("min_off"),
              col("max_off"), col("sum_users"))
        val out = shape(col("user_id") === 42L, 0L)
          .unionAll(shape(col("user_id").isin(7L, 999999L), 1L))
          .unionAll(shape(col("user_id") === 13L &&
            col("event_type") === "click", 2L))
          .orderBy(col("leg"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      Some("""SELECT 0 AS leg, count(*) AS n,
             |  coalesce(min(event_id), -1) AS min_off,
             |  coalesce(max(event_id), -1) AS max_off,
             |  CAST(coalesce(sum(user_id), 0) AS BIGINT) AS sum_users
             |FROM events WHERE user_id = 42
             |UNION ALL
             |SELECT 1, count(*), coalesce(min(event_id), -1),
             |  coalesce(max(event_id), -1),
             |  CAST(coalesce(sum(user_id), 0) AS BIGINT)
             |FROM events WHERE user_id IN (7, 999999)
             |UNION ALL
             |SELECT 2, count(*), coalesce(min(event_id), -1),
             |  coalesce(max(event_id), -1),
             |  CAST(coalesce(sum(user_id), 0) AS BIGINT)
             |FROM events WHERE user_id = 13 AND event_type = 'click'
             |ORDER BY leg""".stripMargin)),

    // ---- SCHEMA EVOLUTION through the log: the stream's shape WIDENS
    //      mid-topic (the schema-change rotation path writes the new
    //      shape into the same topic), and reads must union the file
    //      schemas — pre-evolution rows null-fill the new column, and
    //      aggregates group across the boundary. The oracle recomputes
    //      the same frame with a CASE at the cut offset: a reader that
    //      samples one footer (dropping the evolved column) or
    //      mis-fills either half breaks the hash. ----
    QuerySpec("commitlog_schema_evolution",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-evo-q").toString
        val in = stream(s, d).select(col("part"), col("off"),
          col("user_id"), col("event_type"))
        val cut = in.agg(max(col("off"))).head().getLong(0) / 2
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") <= cut).drop("event_type"),
          dir, "events", flushSize = 500)
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") > cut), dir, "events", flushSize = 500)
        val out = graft.ingest.CommitLog.read(s, dir, "events")
          .groupBy(col("part"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
          .orderBy(col("part"), col("event_type"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      Some(s"""WITH cut AS (SELECT max(event_id) // 2 AS c FROM events)
              |SELECT event_id % ${P} AS part,
              |  CASE WHEN event_id <= (SELECT c FROM cut) THEN NULL
              |    ELSE event_type END AS event_type,
              |  count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_users
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- DESCRIBE HISTORY for the transactional log: per version,
    //      the commit kind (append vs compaction swap — the protocol's
    //      two-kind invariant), the snapshot row count and partition
    //      spread AT that version via time travel. The audit an
    //      operator runs before trusting retention/vacuum decisions.
    //      Entirely metadata-driven: versions enumerate driver-side
    //      (the log manifest is metadata), each pinned snapshot is one
    //      count aggregate; the oracle re-derives every snapshot from
    //      the raw table arithmetic (append halves split at
    //      max(off) div 2; the swap rewrites without changing rows). ----
    QuerySpec("commitlog_history",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-hist-q").toString
        val in = stream(s, d).drop("topic", "ts")
        val cut = in.agg(max(col("off"))).head().getLong(0) / 2
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") <= cut), dir, "events", flushSize = 500)
        graft.ingest.CommitLog.writeLogged(
          in.filter(col("off") > cut), dir, "events", flushSize = 500)
        graft.ingest.CommitLog.compactLogged(s, dir, "events",
          targetRecords = 1L << 40)
        val head = graft.ingest.CommitLog.latestVersion(s, dir, "events")
        val hist = (0L to head).map { v =>
          val (adds, removes) =
            graft.ingest.CommitLog.changesAt(s, dir, "events", v)
          val kind = if (removes.isEmpty) "append" else "swap"
          val snap = graft.ingest.CommitLog.read(s, dir, "events", asOf = v)
            .agg(count(lit(1)).as("n"),
              countDistinct(col("part")).as("p")).head()
          (v, kind, adds.size.toLong, removes.size.toLong,
            snap.getLong(0), snap.getLong(1))
        }
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        import s.implicits._
        hist.toDF("version", "kind", "n_files_added", "n_files_removed",
            "n_rows", "n_parts")
          .orderBy(col("version"))
      },
      Some(s"""WITH c AS (SELECT max(event_id) // 2 AS cut FROM events),
              |e1 AS (SELECT event_id % ${P} AS part,
              |    (event_id - min(event_id) OVER (PARTITION BY event_id % ${P})) // 500 AS fi
              |  FROM events WHERE event_id <= (SELECT cut FROM c)),
              |h1 AS (SELECT count(*) AS n, count(DISTINCT part) AS p,
              |    count(DISTINCT (part, fi)) AS f FROM e1),
              |e2 AS (SELECT event_id % ${P} AS part,
              |    (event_id - min(event_id) OVER (PARTITION BY event_id % ${P})) // 500 AS fi
              |  FROM events WHERE event_id > (SELECT cut FROM c)),
              |h2 AS (SELECT count(*) AS n, count(DISTINCT part) AS p,
              |    count(DISTINCT (part, fi)) AS f FROM e2),
              |ha AS (SELECT count(*) AS n,
              |    count(DISTINCT event_id % ${P}) AS p
              |  FROM events)
              |SELECT 0 AS version, 'append' AS kind,
              |  (SELECT f FROM h1)::BIGINT AS n_files_added,
              |  0::BIGINT AS n_files_removed,
              |  (SELECT n FROM h1)::BIGINT AS n_rows,
              |  (SELECT p FROM h1)::BIGINT AS n_parts
              |UNION ALL SELECT 1, 'append',
              |  (SELECT f FROM h2)::BIGINT, 0::BIGINT,
              |  (SELECT n FROM ha)::BIGINT, (SELECT p FROM ha)::BIGINT
              |UNION ALL SELECT 2, 'swap',
              |  (SELECT p FROM ha)::BIGINT,
              |  ((SELECT f FROM h1) + (SELECT f FROM h2))::BIGINT,
              |  (SELECT n FROM ha)::BIGINT, (SELECT p FROM ha)::BIGINT
              |ORDER BY version""".stripMargin)),

    // ---- Kafka log compaction MATERIALIZED (the physical counterpart
    //      of compact_latest_by_key's logical read): ingest the
    //      changelog, compactByKey(user_id) rewrites superseded
    //      generations away in one atomic swap, then read the whole
    //      snapshot back. The oracle computes latest-per-(part, key)
    //      from the raw table — equality proves storage now holds
    //      exactly the live keyset. ----
    QuerySpec("commitlog_compact_by_key",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-clog-kc-q").toString
        val in = stream(s, d).drop("topic", "ts")
        graft.ingest.CommitLog.writeLogged(in, dir, "events", flushSize = 500)
        graft.ingest.CommitLog.compactByKey(s, dir, "events", col("user_id"))
        val out = graft.ingest.CommitLog.read(s, dir, "events")
          .select(col("part"), col("off"), col("user_id"), col("event_type"))
          .orderBy(col("off"))
        val rows = out.collect().toSeq
        val root = new org.apache.hadoop.fs.Path(dir)
        org.apache.hadoop.fs.FileSystem
          .get(root.toUri, s.sparkContext.hadoopConfiguration)
          .delete(root, true)
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
      },
      Some(s"""SELECT event_id % ${P} AS part, max(event_id) AS off,
              |  user_id, arg_max(event_type, event_id) AS event_type
              |FROM events GROUP BY 1, 3 ORDER BY off""".stripMargin)),

    // ---- Log-compaction semantics (Kafka compacted topics): the
    //      latest record per key, resolved by offset with max_by — one
    //      hash aggregate, no window/sort of each key's history. ----
    QuerySpec("compact_latest_by_key",
      (s, d) => stream(s, d).groupBy(col("user_id"))
        .agg(max(col("off")).as("last_off"),
          max_by(col("event_type"), col("off")).as("last_type"),
          max_by(col("value"), col("off")).as("last_value"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, max(event_id) AS last_off,
             |  arg_max(event_type, event_id) AS last_type,
             |  arg_max(value, event_id) AS last_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- Dead-letter routing (Connect's errors.tolerance/DLQ): every
    //      7th payload is corrupted upstream; records whose JSON fails
    //      to parse route to 'dlq', the rest carry their extracted
    //      field to 'main'. One pass, no shuffle — the route decision
    //      is a row-local expression. (Route-by-parse-success equals
    //      the oracle's json_valid gate because every intact props has
    //      a k field.) ----
    QuerySpec("route_malformed",
      (s, d) => {
        val payload = when(pmod(col("event_id"), lit(7L)) === 0,
          concat(lit("corrupt:"), col("props"))).otherwise(col("props"))
        Tables.events(s, d)
          .select(col("event_id"), payload.as("payload"))
          .select(col("event_id"),
            when(get_json_object(col("payload"), "$.k").isNotNull, "main")
              .otherwise("dlq").as("route"),
            get_json_object(col("payload"), "$.k").cast("long").as("k"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id,
             |    CASE WHEN event_id % 7 = 0 THEN 'corrupt:' || props
             |      ELSE props END AS payload
             |  FROM events)
             |SELECT event_id,
             |  CASE WHEN json_valid(payload) THEN 'main' ELSE 'dlq' END AS route,
             |  CASE WHEN json_valid(payload)
             |    THEN json_extract_string(payload, '$.k')::BIGINT
             |    ELSE NULL END AS k
             |FROM p ORDER BY event_id""".stripMargin)),

    // ---- Z-order layout vs time-linear layout, measured: how many
    //      files (and rows) must a 2-D predicate read under each? The
    //      reference's sink partitions by time only (A5/A6) — perfect
    //      hour pruning, zero user pruning. `operators/ZOrder` folds
    //      (user, hour) onto a Morton curve and assigns files by
    //      Z-PREFIX, so every file is a bounding box in both
    //      dimensions and min/max footer stats prune the box query
    //      multiplicatively. The report quantifies the layout choice:
    //      per layout, total files, files a fixed (user × hour) box
    //      predicate must open, rows inside those files, and the exact
    //      matching rows (identical across layouts — layout changes
    //      cost, never results). Scale shape: coordinates, Morton code
    //      and file id are pure bit-arithmetic projections (no UDF,
    //      codegen'd); per-file stats are one map-side-combined
    //      aggregate per layout; everything after is file-count-scale
    //      metadata. ----
    QuerySpec("zorder_scan_pruning",
      (s, d) => {
        val (uLo, uHi, hLo, hHi) = (0L, 127L, 400L, 527L)
        // 10-bit folds keep sf0.1's 720 distinct hours unwrapped and
        // make the demo SF-independent
        val base = TrackedCache.persist(Tables.events(s, d).select(
          pmod(col("user_id"), lit(1024L)).as("u"),
          pmod(expr("unix_millis(ts) div 3600000"), lit(1024L)).as("h")))
        val matched = base
          .filter(col("u").between(uLo, uHi) && col("h").between(hLo, hHi))
          .agg(count(lit(1)).as("rows_matched"))
        def report(layout: String, file: org.apache.spark.sql.Column) = {
          val hit = col("hu") >= uLo && col("lu") <= uHi &&
            col("hh") >= hLo && col("lh") <= hHi
          base.groupBy(file.as("f"))
            .agg(count(lit(1)).as("n"), min(col("u")).as("lu"),
              max(col("u")).as("hu"), min(col("h")).as("lh"),
              max(col("h")).as("hh"))
            .agg(count(lit(1)).as("files_total"),
              sum(when(hit, 1L).otherwise(0L)).as("files_read"),
              sum(when(hit, col("n")).otherwise(0L)).as("rows_read"))
            .select(lit(layout).as("layout"), col("files_total"),
              col("files_read"), col("rows_read"))
        }
        val z = graft.operators.ZOrder.interleave(col("u"), col("h"), 10)
        report("linear_time", shiftright(col("h"), 4))
          .unionByName(report("zorder",
            graft.operators.ZOrder.zFile(z, bits = 10, fileBits = 6)))
          .crossJoin(broadcast(matched))
          .orderBy(col("layout"))
      },
      Some {
        val z = graft.operators.ZOrder.interleaveSql("u", "h", 10)
        val hit = "hu >= 0 AND lu <= 127 AND hh >= 400 AND lh <= 527"
        s"""WITH b AS (SELECT user_id % 1024 AS u,
           |    (epoch_ms(ts) // 3600000) % 1024 AS h FROM events),
           |zb AS (SELECT u, h, ($z) AS z FROM b),
           |zs AS (SELECT z >> 14 AS f, count(*)::BIGINT AS n,
           |    min(u) AS lu, max(u) AS hu, min(h) AS lh, max(h) AS hh
           |  FROM zb GROUP BY 1),
           |ls AS (SELECT h >> 4 AS f, count(*)::BIGINT AS n,
           |    min(u) AS lu, max(u) AS hu, min(h) AS lh, max(h) AS hh
           |  FROM b GROUP BY 1),
           |m AS (SELECT count(*)::BIGINT AS rows_matched FROM b
           |  WHERE u BETWEEN 0 AND 127 AND h BETWEEN 400 AND 527),
           |r AS (SELECT 'linear_time' AS layout,
           |    count(*)::BIGINT AS files_total,
           |    sum(CASE WHEN $hit THEN 1 ELSE 0 END)::BIGINT AS files_read,
           |    sum(CASE WHEN $hit THEN n ELSE 0 END)::BIGINT AS rows_read
           |  FROM ls
           |  UNION ALL
           |  SELECT 'zorder', count(*)::BIGINT,
           |    sum(CASE WHEN $hit THEN 1 ELSE 0 END)::BIGINT,
           |    sum(CASE WHEN $hit THEN n ELSE 0 END)::BIGINT
           |  FROM zs)
           |SELECT layout, files_total, files_read, rows_read, rows_matched
           |FROM r CROSS JOIN m ORDER BY layout""".stripMargin
      }),

    // ---- Ingest throughput, measured: the reference IS a sink
    //      connector, so the bench must time the WRITE plane, not just
    //      the query surface. Each row drives the full production
    //      commit protocol (size rotation → +tmp staging → manifest →
    //      atomic rename) at bench scale and verifies the result by
    //      READING THE COMMITTED FILES BACK — the returned summary
    //      (rows, offsets, payload checksum, file counts) must match a
    //      DuckDB oracle computing the same facts from the raw table,
    //      so a dropped or duplicated record anywhere in the
    //      stage/commit/read cycle fails the hash. Bench seconds /
    //      row count IS the single-node ingest throughput figure the
    //      reference never published (BASELINE.md). ----

    // B2/A11/A14/A20 — parquet sink throughput: 600k lineitem rows
    // through BatchWriter's staging+manifest+rename at flush.size=50k.
    QuerySpec("ingest_commit_throughput",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-ingest-pq").toString
        val in = withStreamOffsets(
          Tables.lineitem(s, d)
            .select(pmod(col("l_orderkey"), lit(P.toLong)).as("part"),
              col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"), col("l_extendedprice")),
          Seq(col("part")))
        val manifest = graft.ingest.BatchWriter.write(
          in, dir, "lineitem", flushSize = 50000)
        val files = manifest.groupBy(_.partition)
          .map { case (p, fs) => (p: Any, fs.size.toLong) }
        val agg = graft.ingest.BatchWriter.read(s, dir, "lineitem")
          .groupBy(col("part").cast("long").as("part"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            min(col("off")).as("min_off"), max(col("off")).as("max_off"))
        finishIngestBench(s, agg, dir, "part", files).orderBy(col("part"))
      },
      Some(s"""WITH e AS (SELECT l_orderkey % $P AS part, l_quantity,
              |    row_number() OVER (PARTITION BY l_orderkey % $P
              |      ORDER BY l_orderkey, l_linenumber) - 1 AS off
              |  FROM lineitem)
              |SELECT part, count(*) AS n_rows,
              |  sum(l_quantity)::BIGINT AS sum_qty,
              |  min(off) AS min_off, max(off) AS max_off,
              |  count(DISTINCT off // 50000) AS n_files
              |FROM e GROUP BY part ORDER BY part""".stripMargin),
      bench = true),

    // B1 — avro sink throughput: the events stream through AvroSink's
    // attempt-isolated staging writer (container files + codec), read
    // back via the binaryFile + avro-core scan.
    QuerySpec("ingest_avro_throughput",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-ingest-avro").toString
        val in = stream(s, d).select(col("part"), col("off"),
          col("user_id"), col("event_type"), col("value"))
        val manifest = graft.ingest.AvroSink.write(
          in, dir, "events", flushSize = 25000)
        val files = manifest.groupBy(_.partition)
          .map { case (p, fs) => (p: Any, fs.size.toLong) }
        val agg = graft.ingest.AvroSink
          .readDataFrame(s, s"$dir/events/partition=*", in.schema)
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("user_id")).as("sum_users"),
            min(col("off")).as("min_off"), max(col("off")).as("max_off"))
        finishIngestBench(s, agg, dir, "part", files).orderBy(col("part"))
      },
      Some(s"""WITH e AS (SELECT event_id % $P AS part, event_id AS off,
              |    user_id FROM events),
              |f AS (SELECT part, off, user_id,
              |    (off - min(off) OVER (PARTITION BY part)) // 25000 AS fi
              |  FROM e)
              |SELECT part, count(*) AS n_rows,
              |  sum(user_id)::BIGINT AS sum_users,
              |  min(off) AS min_off, max(off) AS max_off,
              |  count(DISTINCT fi) AS n_files
              |FROM f GROUP BY part ORDER BY part""".stripMargin),
      bench = true),

    // A2 at write scale — multi-topic demux throughput: one batch
    // fanned out to three topics by a record field (the reference's
    // topics list on one connector), one shared staging plane, one
    // commit protocol, per-topic read-back.
    QuerySpec("ingest_demux_throughput",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-ingest-demux").toString
        val in = withStreamOffsets(
          Tables.lineitem(s, d)
            .select(concat(lit("flag_"), lower(col("l_returnflag"))).as("topic"),
              pmod(col("l_orderkey"), lit(P.toLong)).as("part"),
              col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          Seq(col("topic"), col("part")))
        val manifest = graft.ingest.BatchWriter.writeMulti(
          in, dir, flushSize = 50000)
        val files = manifest.groupBy(_.topic)
          .map { case (t, fs) => (t: Any, fs.size.toLong) }
        val agg = manifest.map(_.topic).distinct.sorted
          .map(t => graft.ingest.BatchWriter.read(s, dir, t)
            .withColumn("topic", lit(t)))
          .reduce(_ unionByName _)
          .groupBy(col("topic"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            max(col("off")).as("max_off"))
        finishIngestBench(s, agg, dir, "topic", files).orderBy(col("topic"))
      },
      Some(s"""WITH e AS (SELECT 'flag_' || lower(l_returnflag) AS topic,
              |    l_orderkey % $P AS part, l_quantity,
              |    row_number() OVER (
              |      PARTITION BY 'flag_' || lower(l_returnflag), l_orderkey % $P
              |      ORDER BY l_orderkey, l_linenumber) - 1 AS off
              |  FROM lineitem)
              |SELECT topic, count(*) AS n_rows,
              |  sum(l_quantity)::BIGINT AS sum_qty, max(off) AS max_off,
              |  count(DISTINCT printf('%d:%d', part, off // 50000)) AS n_files
              |FROM e GROUP BY topic ORDER BY topic""".stripMargin),
      bench = true),

    // A10/A16–A21 at measured scale — STREAMING commit-loop
    // throughput: the reference's actual runtime shape is a
    // continuous micro-batch loop (put → buffer → rotate → commit),
    // so the per-batch protocol overhead is the number that matters.
    // 20k events (capped so the probe is constant work at any SF ≥
    // 0.02) feed a MemoryStream in 4 FIXED micro-batches of 5000
    // through `StreamIngest.start`'s exactly-once commit loop at
    // flush.size=2000; size rotation splits the OFFSET SPACE, and a
    // part's offsets stride by $P within each 5000-offset batch, so
    // every (batch, part) slice spans 5000 offsets → 3 committed
    // files — the oracle mirrors exactly that
    // ((off − batch-part min) // 2000 distinct per part). Read-back
    // + checksum as in the batch rows. ----
    QuerySpec("ingest_stream_throughput",
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val out = java.nio.file.Files
          .createTempDirectory("graft-ingest-stream").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-ingest-ckpt").toString
        val data = Tables.events(s, d)
          .filter(col("event_id") < 20000)
          .select(pmod(col("event_id"), lit(P.toLong)).as("part"),
            col("event_id").as("off"), col("user_id"))
          .orderBy(col("off"))
          .as[(Long, Long, Long)].collect()
        val src = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Long, Long)]
        val q = graft.streaming.StreamIngest.start(
          src.toDF().toDF("part", "off", "user_id"), out, "events",
          flushSize = 2000, ckpt)
        try data.grouped(5000).foreach { batch =>
          src.addData(batch.toSeq)
          q.processAllAvailable()
        } finally q.stop()
        val re = FileNaming.CommittedFilenameRegex.r
        val files = graft.ingest.BatchWriter.listCommitted(s, out, "events")
          .flatMap(n => re.findFirstMatchIn(n).map(_.group(2).toLong))
          .groupBy(identity).map { case (p, l) => (p: Any, l.size.toLong) }
        val agg = graft.ingest.BatchWriter.read(s, out, "events")
          .groupBy(col("part").cast("long").as("part"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("user_id")).as("sum_users"), max(col("off")).as("max_off"))
        val done = finishIngestBench(s, agg, out, "part", files)
        val ckptRoot = new org.apache.hadoop.fs.Path(ckpt)
        org.apache.hadoop.fs.FileSystem
          .get(ckptRoot.toUri, s.sparkContext.hadoopConfiguration)
          .delete(ckptRoot, true)
        done.orderBy(col("part"))
      },
      Some(s"""WITH e AS (SELECT event_id % $P AS part, event_id AS off,
              |    user_id FROM events WHERE event_id < 20000),
              |b AS (SELECT part, off, user_id, off // 5000 AS batch FROM e),
              |f AS (SELECT part, off, user_id, batch,
              |    (off - min(off) OVER (PARTITION BY part, batch)) // 2000 AS fi
              |  FROM b)
              |SELECT part, count(*) AS n_rows,
              |  sum(user_id)::BIGINT AS sum_users, max(off) AS max_off,
              |  count(DISTINCT printf('%d:%d', batch, fi)) AS n_files
              |FROM f GROUP BY part ORDER BY part""".stripMargin),
      bench = true),

    QuerySpec("ingest_orc_roundtrip",
      formatRoundtrip("orc", None), Some(formatRoundtripSql)),

    QuerySpec("ingest_csv_roundtrip",
      formatRoundtrip("csv", Some(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("off",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType))))),
      Some(formatRoundtripSql)))

  /** B4/B5–B7 closure — the two BatchWriter formats without an
    * oracle-gated registry row until now. Same write→commit→read-back
    * →checksum discipline as the throughput rows (ORC carries its own
    * schema; CSV reads back under an explicit one, the reference's
    * schema-supplied read path). */
  private def formatRoundtrip(fmt: String,
                              schema: Option[org.apache.spark.sql.types.StructType])
      : (SparkSession, String) => DataFrame = (s, d) => {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-ingest-$fmt").toString
    val in = stream(s, d).filter(col("off") < 20000)
      .select(col("part"), col("off"), col("user_id"), col("event_type"))
    val manifest = graft.ingest.BatchWriter.write(
      in, dir, "events", flushSize = 5000, format = fmt)
    val files = manifest.groupBy(_.partition)
      .map { case (p, fs) => (p: Any, fs.size.toLong) }
    val agg = graft.ingest.BatchWriter.read(s, dir, "events", fmt, schema)
      .groupBy(col("part").cast("long").as("part"))
      .agg(count(lit(1)).as("n_rows"), sum(col("user_id")).as("sum_users"),
        max(col("off")).as("max_off"),
        countDistinct(col("event_type")).as("n_types"))
    finishIngestBench(s, agg, dir, "part", files).orderBy(col("part"))
  }

  // def, not val: referenced during `specs` initialization, which runs
  // before a later val's initializer would
  private def formatRoundtripSql: String =
    s"""WITH e AS (SELECT event_id % $P AS part, event_id AS off, user_id,
       |    event_type FROM events WHERE event_id < 20000),
       |f AS (SELECT part, off, user_id, event_type,
       |    (off - min(off) OVER (PARTITION BY part)) // 5000 AS fi FROM e)
       |SELECT part, count(*) AS n_rows, sum(user_id)::BIGINT AS sum_users,
       |  max(off) AS max_off, count(DISTINCT event_type) AS n_types,
       |  count(DISTINCT fi) AS n_files
       |FROM f GROUP BY part ORDER BY part""".stripMargin

  /** Contiguous per-stream offsets 0..n−1 ordered by
    * (l_orderkey, l_linenumber) WITHOUT a per-stream global sort —
    * the two-level rank the corpus `Shuffle` operator uses: bucket
    * counts (one map-side-combined aggregate) → running bases over
    * the metadata-scale bucket frame → broadcast back → rank within
    * (stream, bucket). Identical result to
    * `row_number() over (partition by stream order by orderkey,
    * linenumber) − 1` — the oracles state exactly that — but the big
    * window partitions by (stream, bucket) instead of the handful of
    * streams, so offset synthesis parallelizes at any scale (a
    * 4-stream global sort was the measured bottleneck of the ingest
    * bench at sf1: 3× the cost of the commit protocol it fed). Real
    * deployments take offsets from the source; this synthesis exists
    * only because the testdata is a table. */
  private def withStreamOffsets(df: DataFrame,
                                streamCols: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val keyed = df.withColumn("__bkt",
      (col("l_orderkey") / lit(4096)).cast("long"))
    val bases = keyed.groupBy(streamCols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__base",
        sum(col("__c")).over(Window.partitionBy(streamCols: _*)
          .orderBy(col("__bkt"))) - col("__c"))
      .drop("__c")
    val joinKeys = bases.columns.filter(_ != "__base").toSeq
    keyed.join(broadcast(bases), joinKeys)
      .withColumn("off",
        (row_number().over(Window.partitionBy(streamCols :+ col("__bkt"): _*)
          .orderBy(col("l_orderkey"), col("l_linenumber")))
          - 1 + col("__base")).cast("long"))
      .drop("__bkt", "__base")
  }

  /** Collect the metadata-scale ingest summary, append the manifest's
    * per-key committed-file count, reclaim the temp ingest dir, and
    * return a local frame (the files must be deleted BEFORE returning
    * — the caller's action re-reads nothing). */
  private def finishIngestBench(s: SparkSession, agg: DataFrame,
                                dir: String, key: String,
                                files: Map[Any, Long]): DataFrame = {
    val rows = agg.collect().toSeq.map(r =>
      org.apache.spark.sql.Row.fromSeq(
        r.toSeq :+ files.getOrElse(r.getAs[Any](key), 0L)))
    val root = new org.apache.hadoop.fs.Path(dir)
    org.apache.hadoop.fs.FileSystem
      .get(root.toUri, s.sparkContext.hadoopConfiguration)
      .delete(root, true)
    s.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      agg.schema.add("n_files", org.apache.spark.sql.types.LongType))
  }
}
