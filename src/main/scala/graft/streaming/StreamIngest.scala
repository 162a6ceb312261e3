package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{BatchWriter, CommitLog, GraftConfig}

/** Streaming ingest (SURVEY §7 M5): the reference's continuously-running
  * exactly-once pipeline (`HdfsSinkTask.put` → buffer → rotate → WAL →
  * rename, `TopicPartitionWriter.java:313-433`) as Structured Streaming.
  *
  * Spark-native replacements for the reference machinery:
  *  - consumer offset tracking / rewind  → checkpoint `offsets/`
  *  - WAL append/apply/truncate (A16-18) → checkpoint + idempotent
  *    micro-batch commit below
  *  - retry w/ backoff (A22)             → batch replay from checkpoint
  *  - rebalance open/close (A23)         → Spark scheduler internal
  *
  * Exactly-once: each micro-batch first drops offsets at or below the
  * committed maximum recovered FROM FILENAMES (the reference's own
  * source of truth, `FileUtils.java:106-149`), then commits via atomic
  * renames. A replayed batch after a crash re-filters to nothing — the
  * same idempotent-redo contract as `FSWAL.apply`.
  */
object StreamIngest {

  /** Start the commit pipeline on a stream shaped (part, off, ...).
    *
    * Committed offsets are recovered from filenames ONCE at query
    * start (the reference's recover-on-start, `HdfsSinkTask.java:145-149`)
    * and then maintained incrementally from each batch's commit
    * manifest — the recursive directory listing does not re-run per
    * micro-batch, so its cost no longer grows with total file count.
    * A restart re-lists, which is exactly the crash-recovery contract. */
  def start(stream: DataFrame, outDir: String, topic: String, flushSize: Int,
            checkpoint: String, trigger: Option[Trigger] = None,
            format: String = "parquet"): StreamingQuery =
    commitLoop(stream, outDir, topic, flushSize, checkpoint, trigger, format,
      initial = BatchWriter.maxCommittedOffsets(stream.sparkSession, outDir, topic),
      afterWrite = _ => ())

  /** The foreachBatch query scaffolding every commit loop shares:
    * checkpoint + optional trigger + start. */
  private def batchQuery(stream: DataFrame, checkpoint: String,
                         trigger: Option[Trigger])
                        (body: DataFrame => Unit): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, _: Long) => body(batch) }.start()
  }

  /** The shared micro-batch commit loop: dedup → resume-filter →
    * write → (hook) → advance offsets. `afterWrite` runs after the
    * batch's files are durably renamed and before the in-memory
    * offsets advance — the logged path publishes there. */
  private def commitLoop(stream: DataFrame, outDir: String, topic: String,
                         flushSize: Int, checkpoint: String,
                         trigger: Option[Trigger], format: String,
                         initial: Map[Long, Long],
                         afterWrite: Seq[BatchWriter.CommittedFile] => Unit): StreamingQuery = {
    var committed = initial
    batchQuery(stream, checkpoint, trigger) { batch =>
      // batch-local offset dedup: an at-least-once upstream can hand
      // the SAME (part, off) twice within one micro-batch, which the
      // committed-offset filter alone cannot catch
      val deduped = batch.dropDuplicates("part", "off")
      // pin the filtered batch: isEmpty + the write's staging/manifest
      // jobs would otherwise re-read the source up to three times
      val fresh = BatchWriter.resumeFrom(deduped, committed).persist()
      try {
        if (!fresh.isEmpty) {
          val manifest = BatchWriter.write(fresh, outDir, topic, flushSize,
            format = format)
          afterWrite(manifest)
          committed = manifest.foldLeft(committed) { (m, f) =>
            m.updated(f.partition, math.max(m.getOrElse(f.partition, -1L), f.endOffset))
          }
        }
      } finally { fresh.unpersist(); () }
    }
  }

  /** [[start]] with the transactional metadata-log commit: each
    * micro-batch's files publish as ONE atomic `CommitLog` version and
    * resume offsets come from the log snapshot, not a directory
    * listing. Exactly-once survives a crash BETWEEN data-rename and
    * publish: the restarted stream resumes from the log (which never
    * saw the orphaned batch) and re-ingests those offsets. Where the
    * replay reproduces a file boundary, the rename is idempotently
    * skipped and the redone publish adopts the orphan; where new
    * offsets shift the tail grouping, the stale partial file simply
    * stays unreferenced — log readers can never see it next to its
    * overlapping replacement (the double-read a directory lister WOULD
    * hit), and `vacuum` reclaims it at leisure. */
  def startLogged(stream: DataFrame, outDir: String, topic: String,
                  flushSize: Int, checkpoint: String,
                  trigger: Option[Trigger] = None,
                  format: String = "parquet"): StreamingQuery = {
    val spark = stream.sparkSession
    commitLoop(stream, outDir, topic, flushSize, checkpoint, trigger, format,
      initial = CommitLog.maxOffsets(spark, outDir, topic),
      afterWrite = manifest =>
        CommitLog.publish(spark, outDir, topic, manifest.map { c =>
          s"partition=${c.partition}/" +
            new org.apache.hadoop.fs.Path(c.path).getName
        }))
  }

  /** [[startLogged]] driven by a validated [[GraftConfig]] — flush
    * size, format and the scheduled-rotation trigger
    * (`rotate.schedule.interval.ms` > 0 → processing-time trigger)
    * all come from the one typed config instead of loose arguments. */
  def startLogged(stream: DataFrame, outDir: String, topic: String,
                  cfg: GraftConfig, checkpoint: String): StreamingQuery = {
    require(cfg.format != "avro",
      "the streaming committer writes through BatchWriter formats; " +
        "use AvroSink/GraftConfig.write for avro batches")
    startLogged(stream, outDir, topic, cfg.flushSize, checkpoint,
      trigger =
        if (cfg.rotateScheduleIntervalMs > 0)
          Some(Trigger.ProcessingTime(cfg.rotateScheduleIntervalMs))
        else None,
      format = cfg.format)
  }

  /** [[startLoggedMulti]] driven by a validated [[GraftConfig]] —
    * same knob mapping as the single-topic config overload. */
  def startLoggedMulti(stream: DataFrame, outDir: String, cfg: GraftConfig,
                       checkpoint: String): StreamingQuery = {
    require(cfg.format != "avro",
      "the streaming committer writes through BatchWriter formats; " +
        "use AvroSink/GraftConfig.write for avro batches")
    startLoggedMulti(stream, outDir, cfg.flushSize, checkpoint,
      trigger =
        if (cfg.rotateScheduleIntervalMs > 0)
          Some(Trigger.ProcessingTime(cfg.rotateScheduleIntervalMs))
        else None,
      format = cfg.format)
  }

  /** Multi-topic orchestration — the reference's `DataWriter.write`
    * demultiplexes one record stream across every topic's writers in a
    * single consumer pass (`DataWriter.java:347-353`: group records by
    * TopicPartition, buffer into each partition's
    * `TopicPartitionWriter`). The Spark-native equivalent: ONE
    * streaming query whose micro-batch is pinned once, then sliced
    * per-topic over the cached partitions — N topics never mean N
    * source scans or N concurrent queries, and the stream checkpoint
    * advances all topics together.
    *
    * Per-topic isolation matches the reference's
    * writer-per-TopicPartition model: each topic keeps its OWN commit
    * log (atomic version publish) and its own committed-offset map,
    * recovered from that topic's log the first time the topic appears
    * in the stream and maintained incrementally after. A crash between
    * topic A's publish and topic B's publish replays the batch; A's
    * resume filter drops its already-committed offsets (idempotent
    * redo), B ingests as if the crash never happened — exactly-once
    * per topic, no cross-topic coupling.
    *
    * `stream` is shaped (topic, part, off, payload...); the `topic`
    * column routes and becomes the directory
    * (`<outDir>/<topic>/partition=<p>/`), never file content.
    * Pair with `KafkaSource.fromTopics` + `normalize` in production.
    *
    * Scale shape: job count per micro-batch is O(1) in topic count —
    * one (topic, part)-keyed resume filter (broadcast join over the
    * per-partition offset maps, metadata-scale), ONE staging job
    * dynamic-partitioned by (topic, part, file_idx)
    * (`BatchWriter.writeMulti`), one manifest aggregate. Only the
    * COMMIT stays per-topic — each topic's log is its own atomicity
    * domain, and those publishes are driver-side metadata ops. */
  def startLoggedMulti(stream: DataFrame, outDir: String, flushSize: Int,
                       checkpoint: String, trigger: Option[Trigger] = None,
                       format: String = "parquet"): StreamingQuery = {
    val spark = stream.sparkSession
    val committed = scala.collection.mutable.Map.empty[String, Map[Long, Long]]
    batchQuery(stream, checkpoint, trigger) { batch =>
      // one dedup keyed (topic, part, off) — offsets are per-topic
      // sequences, so the same (part, off) on two topics is two
      // distinct records
      val deduped = batch.dropDuplicates("topic", "part", "off").persist()
      try {
        // the topic roster of THIS batch is metadata-scale (the
        // reference holds one writer map per assigned topic too);
        // first sighting of a topic recovers its offsets from its log
        val topics = deduped.select("topic").distinct()
          .collect().map(_.getString(0)).sorted
        topics.foreach { topic =>
          committed.getOrElseUpdate(topic,
            CommitLog.maxOffsets(spark, outDir, topic))
          ()
        }
        val fresh = BatchWriter.resumeFromMulti(deduped, committed.toMap)
          .persist()
        try {
          if (!fresh.isEmpty) {
            val manifest =
              BatchWriter.writeMulti(fresh, outDir, flushSize, format = format)
            manifest.groupBy(_.topic).toSeq.sortBy(_._1)
              .foreach { case (topic, files) =>
                CommitLog.publish(spark, outDir, topic, files.map { c =>
                  s"partition=${c.partition}/" +
                    new org.apache.hadoop.fs.Path(c.path).getName
                })
                committed(topic) = files.foldLeft(committed(topic)) { (m, f) =>
                  m.updated(f.partition,
                    math.max(m.getOrElse(f.partition, -1L), f.endOffset))
                }
              }
          }
        } finally { fresh.unpersist(); () }
      } finally { deduped.unpersist(); () }
    }
  }

  /** A13 — wallclock scheduled rotation in the streaming plane
    * (`rotate.schedule.interval.ms`, `TopicPartitionWriter.java:297-310`
    * + partial-file flush test `DataWriterAvroTest.java:356-403`): the
    * commit cadence is a processing-time trigger at `periodMs`, and a
    * micro-batch holding FEWER than `flushSize` records still commits
    * its file when the schedule fires — the partial-file flush the
    * reference tests.
    *
    * Day alignment: Spark's ProcessingTime trigger fires at
    * epoch-aligned multiples of the period; the epoch is anchored at
    * UTC midnight, so for periods dividing 24h these are exactly the
    * reference's midnight-anchored fire times
    * (`Rotation.nextTimeAdjustedByDay` — equivalence property-tested
    * in RotationSpec). Periods that do not divide a day re-anchor at
    * each midnight in the reference; pick a divisor period (the
    * reference's own default configs do) to keep the contracts equal. */
  def startScheduled(stream: DataFrame, outDir: String, topic: String,
                     flushSize: Int, checkpoint: String,
                     periodMs: Long): StreamingQuery =
    start(stream, outDir, topic, flushSize, checkpoint,
      Some(Trigger.ProcessingTime(periodMs)))

  /** [[startScheduled]] through the transactional commit log: the
    * schedule-fired partial file is published as an atomic version. */
  def startScheduledLogged(stream: DataFrame, outDir: String, topic: String,
                           flushSize: Int, checkpoint: String,
                           periodMs: Long): StreamingQuery =
    startLogged(stream, outDir, topic, flushSize, checkpoint,
      Some(Trigger.ProcessingTime(periodMs)))

  /** Event-time bucketing with late-data handling (A12's semantics:
    * a time bucket closes only once a later record advances the clock —
    * exactly the watermark contract, `TopicPartitionWriterTest.java:404`). */
  def windowedCounts(events: DataFrame, tsCol: String, windowDur: String,
                     watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("n"))

  /** Gap-based sessionization on the live stream: Spark's native
    * `session_window` keeps per-key session state and emits a session
    * once the watermark passes its close — the streaming twin of the
    * batch `sessionize_events` query (same 30-minute-gap semantics,
    * state bounded by the watermark instead of a sort). */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
                    watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(col("user_id"), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Offset-keyed dedup across the stream (at-least-once source →
    * exactly-once records), bounded by the watermark. */
  def dedupOffsets(events: DataFrame, tsCol: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates("part", "off")

  /** Stream-stream enrichment join: each left event picks up right
    * events with the same `key` whose timestamp falls in
    * `[left.ts - lookback, left.ts]` — the streaming twin of the batch
    * `range_join_signup_hour` interval join. Both sides carry
    * watermarks AND the join condition bounds event-time range, which
    * is what lets Spark expire join state instead of buffering both
    * streams forever — state per key is O(lookback), not O(stream).
    *
    * The result keeps BOTH sides' `key`/timestamp columns under the
    * `l` and `r` aliases — select them qualified (`col("l.user")`),
    * an unqualified `col("user")` is ambiguous. */
  def enrichWithinLookback(left: DataFrame, right: DataFrame, key: String,
                           leftTs: String, rightTs: String,
                           watermarkDelay: String, lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lookback") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"))
  }
}
