package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ingest.{AvroSink, BatchWriter, CommitLog}

/** Content-exact dedup at the ingestion gate: [[StreamIngest.startLogged]]
  * plus an admission filter that drops any record whose PAYLOAD was
  * already committed — the streaming twin of the `dedup_incremental`
  * batch query, run before data ever lands (the shape a training-data
  * pipeline wants: never store the duplicate, instead of re-deduping
  * the corpus later).
  *
  * Scale shape per micro-batch: the corpus is represented by a
  * fingerprint INDEX (16-byte md5 per committed record, one parquet
  * file per commit-log version — fingerprints shuffle, documents never
  * do). The batch's fingerprints BROADCAST into a semi-join against the
  * index (the index never shuffles; its scan is the only corpus-sized
  * read), the resulting known-set broadcasts back into an anti-join
  * against the batch, and only novel records reach the committer.
  *
  * Exactly-once composes with the fingerprint index through version
  * numbering: each batch's novel fingerprints are written to
  * `_fp/v<version>.parquet` AFTER the data's atomic log publish, named
  * by that publish's version. A crash between publish and fingerprint
  * write leaves a version without its index file —
  * [[reconcileFingerprints]] (run at every start) rebuilds exactly the
  * missing versions from their committed data files, so the index is
  * always consistent with the log when the stream begins. The `_fp`
  * directory never collides with the data plane: its names match no
  * committed-file pattern, so compaction, vacuum, and max-offset
  * listings all ignore it.
  */
object DedupIngest {

  /** Content fingerprint: md5 over the canonical JSON of every column
    * EXCEPT the stream envelope (`part`, `off`), in name order — the
    * same payload at a different offset is a duplicate. Matches the
    * committed files' content on redo: parquet/orc/json encode `part`
    * into the directory layout (so content is payload + off), avro
    * keeps it in content; both sides exclude the envelope. */
  def fingerprint(df: DataFrame): Column = {
    val payload = df.columns.filterNot(Set("part", "off")).sorted
    require(payload.nonEmpty, "no payload columns to fingerprint")
    md5(to_json(struct(payload.map(col): _*)).cast("binary"))
  }

  private def fpDirPath(outDir: String, topic: String) =
    new Path(s"$outDir/$topic/_fp")

  private def hfs(spark: SparkSession, outDir: String): FileSystem =
    FileSystem.get(new Path(outDir).toUri,
      spark.sparkContext.hadoopConfiguration)

  private val FpSchema = StructType(Seq(StructField("fp", StringType)))

  /** The committed-corpus fingerprint set (column `fp`) — empty frame
    * when nothing has been committed yet. */
  def fingerprintIndex(spark: SparkSession, outDir: String,
                       topic: String): DataFrame = {
    val dir = fpDirPath(outDir, topic)
    val f = hfs(spark, outDir)
    // explicit FILE paths, not the directory root: `_fp` is
    // underscore-prefixed so the data plane's discovery skips it, but
    // handing it to a reader as the root makes Spark log a spurious
    // "all paths were ignored" warning on every micro-batch
    val files =
      if (!f.exists(dir)) Array.empty[String]
      else f.listStatus(dir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
    if (files.nonEmpty)
      spark.read.schema(FpSchema).parquet(files.toIndexedSeq: _*).select(col("fp"))
    else
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], FpSchema)
  }

  /** Atomically install one version's fingerprint file (idempotent —
    * a replayed batch that reproduces the version skips the write). */
  private def writeFpFile(spark: SparkSession, outDir: String, topic: String,
                          version: Long, fps: DataFrame): Unit = {
    val dir = fpDirPath(outDir, topic)
    val f = hfs(spark, outDir)
    val dest = new Path(dir, s"v$version.parquet")
    if (f.exists(dest)) return
    val tmp = new Path(dir, s".tmp-v$version")
    fps.select(col("fp")).distinct().coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = f.listStatus(tmp).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new java.io.IOException(s"no parquet part under $tmp"))
    if (!f.exists(dest) && !f.rename(part, dest))
      throw new java.io.IOException(s"rename failed: $part -> $dest")
    f.delete(tmp, true)
    ()
  }

  /** Rebuild missing per-version fingerprint files from their committed
    * data (the crash-repair between data publish and fingerprint
    * install, and the upgrade path for a topic written without the
    * gate). Swap (compaction) versions rewrite existing rows and carry
    * no new content, so only append versions need files. Returns the
    * versions rebuilt. */
  def reconcileFingerprints(spark: SparkSession, outDir: String,
                            topic: String,
                            format: String = "parquet"): Seq[Long] = {
    val latest = CommitLog.latestVersion(spark, outDir, topic)
    if (latest < 0) return Seq.empty
    val f = hfs(spark, outDir)
    val dir = fpDirPath(outDir, topic)
    val VName = "v(\\d+)\\.parquet".r
    val have: Set[Long] =
      if (!f.exists(dir)) Set.empty
      else f.listStatus(dir).flatMap(_.getPath.getName match {
        case VName(v) => Some(v.toLong)
        case _ => None
      }).toSet
    (0L to latest).flatMap { v =>
      if (have(v)) None
      else {
        val (adds, removes) = CommitLog.changesAt(spark, outDir, topic, v)
        if (removes.nonEmpty || adds.isEmpty) None
        else {
          val paths = adds.map(rel => s"$outDir/$topic/$rel")
          val df = format match {
            case "avro" =>
              val schema = AvroSink.structTypeFor(
                AvroSink.readSchemaOf(spark, paths.head))
              paths.map(p => AvroSink.readDataFrame(spark, p, schema))
                .reduce(_.union(_))
            case _ => spark.read.format(format).load(paths: _*)
          }
          writeFpFile(spark, outDir, topic, v,
            df.select(fingerprint(df).as("fp")))
          Some(v)
        }
      }
    }
  }

  /** [[StreamIngest.startLogged]] with the content-dedup admission
    * gate. Within a batch the survivor of a duplicated payload is the
    * lowest (part, off) — deterministic, so a crash-replay reproduces
    * the same files. A batch whose every record is a duplicate
    * publishes nothing (dropping IS the commit for those records; the
    * stream checkpoint still advances past them). */
  def startLoggedDeduped(stream: DataFrame, outDir: String, topic: String,
                         flushSize: Int, checkpoint: String,
                         trigger: Option[Trigger] = None,
                         format: String = "parquet",
                         avroCodec: String = "null"): StreamingQuery = {
    val spark = stream.sparkSession
    reconcileFingerprints(spark, outDir, topic, format)
    val write = StreamIngest.writerFor(outDir, topic, flushSize, format, avroCodec)
    var committed = CommitLog.maxOffsets(spark, outDir, topic)
    StreamIngest.batchQuery(stream, checkpoint, trigger) { batch =>
      val deduped = batch.dropDuplicates("part", "off")
      val fresh = BatchWriter.resumeFrom(deduped, committed)
        .withColumn("__fp", fingerprint(deduped))
        .persist()
      try {
        if (!fresh.isEmpty) {
          // deterministic in-batch survivor: lowest (part, off) per fp
          val first = fresh.groupBy(col("__fp"))
            .agg(min(struct(col("part"), col("off"))).as("k"))
            .select(col("__fp"), col("k.part").as("part"),
              col("k.off").as("off"))
          val survivors = fresh.join(first, Seq("__fp", "part", "off"),
            "left_semi")
          // corpus gate: the index never shuffles — the batch's
          // fingerprints broadcast INTO it, the (small) known-set
          // broadcasts back
          val batchFps = survivors.select(col("__fp").as("fp")).distinct()
          val known = fingerprintIndex(spark, outDir, topic)
            .join(broadcast(batchFps), Seq("fp"), "left_semi").distinct()
          val novel = survivors
            .join(broadcast(known), survivors("__fp") === known("fp"),
              "left_anti")
            .persist()
          try {
            if (!novel.isEmpty) {
              val novelFps = novel.select(col("__fp").as("fp")).distinct()
              val manifest = write(novel.drop("__fp"))
              val version = CommitLog.publish(spark, outDir, topic,
                manifest.map(c => StreamIngest.relPath(outDir, topic, c.path)))
              writeFpFile(spark, outDir, topic, version, novelFps)
              committed = manifest.foldLeft(committed) { (m, c) =>
                m.updated(c.partition,
                  math.max(m.getOrElse(c.partition, -1L), c.endOffset))
              }
            }
          } finally { novel.unpersist(); () }
        }
      } finally { fresh.unpersist(); () }
    }
  }
}
