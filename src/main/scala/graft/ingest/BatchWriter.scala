package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingest: the reference's write→commit→recover loop
  * (`/root/reference/src/main/java/io/confluent/connect/hdfs/TopicPartitionWriter.java:313-433`,
  * `FileUtils.java:66-149`) re-expressed Spark-first.
  *
  * Records are assigned to files by size rotation, staged through a
  * temp directory (the `+tmp` convention, `FileUtils.java:66-75`), and
  * committed by atomic rename to offset-ranged names under
  * `<outDir>/<topic>/partition=<p>/`. Spark's task commit protocol
  * makes the staging write all-or-nothing; the rename pass is
  * idempotent redo (skip if destination exists) exactly like the
  * reference's WAL apply (`wal/FSWAL.java:100-135`).
  *
  * Scale notes: the shuffle is one `repartition` on (part, file_idx) —
  * the same key the output layout needs, so no second shuffle at write;
  * the manifest aggregate is tiny (one row per output file); renames
  * are driver-side metadata ops, linear in file count, not data size.
  */
object BatchWriter {

  final case class CommittedFile(topic: String, partition: Long,
      fileIdx: Long, startOffset: Long, endOffset: Long, path: String)

  /** Sink formats (B1–B4, `format.class` in the reference). Avro is
    * part of the surface (`df.write.format("avro")`) but the spark-avro
    * module is not on this container's classpath, so selecting it fails
    * fast with a pointer instead of deep in the write. */
  val Formats: Map[String, String] = Map(
    "parquet" -> ".parquet", "json" -> ".json", "csv" -> ".csv",
    "text" -> ".txt", "orc" -> ".orc")

  /** Write a stream-shaped frame (`part`, `off`, payload columns) as
    * committed offset-ranged files. Returns the commit manifest.
    * `format`: parquet (default, B2) | json (B3) | csv | text (B4 —
    * requires exactly one string payload column, the reference's
    * `record.value().toString` contract). */
  def write(df: DataFrame, outDir: String, topic: String, flushSize: Int,
            pad: Int = FileNaming.DefaultZeroPadWidth,
            format: String = "parquet"): Seq[CommittedFile] = {
    val sized = Rotation.withSizeFileIndex(df, Seq(col("part")), col("off"), flushSize)
    writeAssigned(sized, outDir, topic, pad, format)
  }

  /** Commit a frame that already carries its `file_idx` assignment
    * (size rotation, interval buckets, or schema-rotation segments). */
  def writeAssigned(sizedIn: DataFrame, outDir: String, topic: String,
                    pad: Int = FileNaming.DefaultZeroPadWidth,
                    format: String = "parquet"): Seq[CommittedFile] =
    // staging under +tmp/<topic>: +tmp is shared by concurrently-
    // ingesting topics under the same outDir, each owning its dir
    stageAndCommit(sizedIn, outDir, s"$outDir/+tmp/$topic",
      topicOf = None, topic = topic, pad = pad, format = format)

  /** [[writeAssigned]] routed through a partition ENCODER: `sizedIn`
    * carries an `__enc` column holding each record's encoded-partition
    * directory (the reference's `Partitioner.encodePartition` —
    * `partition=3`, `event_type=click`, `year=2026/month=08/day=12`).
    * Files land under `<outDir>/<topic>/<enc>/` with the same
    * offset-ranged names; the default encoder reproduces
    * [[writeAssigned]]'s layout exactly.
    *
    * Recovery contract for encoded layouts: crash recovery is
    * IDEMPOTENT REDO of the same batch (renames skip committed
    * files), NOT offset filtering — encoding splits a partition's
    * offsets across directories, so a crash mid-commit can land high
    * offsets while lower ones in another directory have not, and a
    * `maxCommittedOffsets`-based resume would skip the gap.
    * Compaction is likewise a default-layout feature — per-directory
    * ranges are gappy/interleaved here, and [[compact]]'s layout guard
    * refuses non-`partition=<p>` paths up front. */
  def writeAssignedEncoded(sizedIn: DataFrame, outDir: String, topic: String,
                           pad: Int = FileNaming.DefaultZeroPadWidth,
                           format: String = "parquet"): Seq[CommittedFile] =
    stageAndCommit(sizedIn, outDir, s"$outDir/+tmp/$topic",
      topicOf = None, encodedOf = Some("__enc"), topic = topic, pad = pad,
      format = format)

  /** The ONE staging+manifest+rename commit protocol, shared by the
    * single-topic ([[writeAssigned]]), multi-topic ([[writeMulti]])
    * and encoded-partition ([[writeAssignedEncoded]]) paths —
    * `topicOf`/`encodedOf` add those columns to every key (routing,
    * staging layout, manifest). */
  private def stageAndCommit(sizedIn: DataFrame, outDir: String,
                             staged: String, topicOf: Option[String],
                             topic: String, pad: Int,
                             format: String,
                             encodedOf: Option[String] = None,
                             nameBounds: Map[(Long, Long), (Long, Long)] =
                               Map.empty): Seq[CommittedFile] = {
    if (format == "avro")
      throw new IllegalArgumentException(
        "avro via DataFrameWriter needs the spark-avro module (absent " +
          "from this classpath) — use graft.ingest.AvroSink.write instead")
    val ext = Formats.getOrElse(format,
      throw new IllegalArgumentException(s"unknown format: $format"))
    val spark = sizedIn.sparkSession
    // single-topic: the name is known at entry — reject it before any
    // cluster work (the multi-topic roster is data, checked post-manifest)
    if (topicOf.isEmpty)
      require(TopicName.matches(topic), s"illegal topic name: '$topic'")
    val keyCols = topicOf.toSeq ++ encodedOf.toSeq ++ Seq("part", "file_idx")

    // Pin the frame across the two jobs below (staging write + manifest
    // aggregate): without this, the whole upstream — including any
    // stream-side resume filter — runs twice, and a nondeterministic
    // recompute could let the manifest disagree with the staged data.
    SessionSafety.disableNaNDroppingCachePruning(sizedIn.sparkSession)
    val sized = sizedIn.persist()

    // Stage: exactly one file per key — the repartition key equals the
    // directory key, so each dynamic partition is written by a single
    // task.
    val payloadCols =
      sized.columns.filterNot(keyCols.toSet + "off").toSeq
    val toStage =
      if (format == "text") {
        // the reference's text sink writes value.toString, one per line
        // (`string/StringRecordWriterProvider.java:71-80`); offsets live
        // only in the filename range
        require(payloadCols.size == 1,
          s"text format needs exactly one payload column, got $payloadCols")
        sized.select(keyCols.map(col) ++ Seq(col("off"),
          col(payloadCols.head).cast("string").as("value")): _*)
      } else sized
    val dropAfterSort: Seq[String] = if (format == "text") Seq("off") else Seq.empty
    toStage.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ "off").map(col): _*)
      .drop(dropAfterSort: _*)
      .write.mode("overwrite").partitionBy(keyCols: _*)
      .format(format).save(staged)

    val manifest = sized.groupBy(keyCols.map(col): _*)
      .agg(min(col("off")).as("s"), max(col("off")).as("e"))
      .collect()
      .map { r =>
        var idx = 0
        def str(opt: Option[String], default: String): String =
          if (opt.isDefined) {
            // null-safe: a null routing value (null partition field /
            // timestamp upstream) must reach the validation below as
            // an illegal value, not NPE the manifest sort
            val v = Option(r.getString(idx)).getOrElse(""); idx += 1; v
          } else default
        val t = str(topicOf, topic)
        val enc = str(encodedOf, "")
        (t, enc, r.getLong(idx), r.getLong(idx + 1),
          r.getLong(idx + 2), r.getLong(idx + 3))
      }
      .sortBy(t => (t._1, t._2, t._3, t._4))
    sized.unpersist()

    val fs = FileSystem.get(new Path(outDir).toUri, spark.sparkContext.hadoopConfiguration)
    // validate EVERY topic name and encoded path before the FIRST
    // rename: a bad value mid-loop would otherwise leave earlier
    // groups' files already committed — a torn batch. Pre-commit, so
    // cleaning staging and failing is safe.
    val badTopics = manifest.map(_._1).distinct.filterNot(TopicName.matches)
    val badEnc = encodedOf.toSeq.flatMap(_ => manifest.map(_._2).distinct
      .filter(v => v.isEmpty || v.startsWith("/") || v.split('/').exists(seg =>
        seg.isEmpty || seg == "." || seg == "..")))
    if (badTopics.nonEmpty || badEnc.nonEmpty) {
      fs.delete(new Path(staged), true)
      def show(v: String) = if (v.isEmpty) "<null/empty>" else s"'$v'"
      val hint =
        if ((badTopics ++ badEnc).exists(_.isEmpty))
          " (a null partition field or timestamp encodes to an empty value)"
        else ""
      throw new IllegalArgumentException(
        s"illegal topic name(s)/encoded partition(s): " +
          (badTopics.map(show) ++ badEnc.map(show)).mkString(", ") + hint)
    }
    val committed = manifest.toSeq.map { case (t, enc, p, i, s, e) =>
      val encSeg = encodedOf.map { ec =>
        // Spark escapes special chars (e.g. '/') in dynamic-partition
        // directory VALUES — reproduce its escaping to locate the dir
        s"/$ec=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(enc)
      }.getOrElse("")
      val srcDir = topicOf match {
        case Some(tc) => new Path(s"$staged/$tc=$t$encSeg/part=$p/file_idx=$i")
        case None => new Path(s"$staged$encSeg/part=$p/file_idx=$i")
      }
      val srcs = fs.listStatus(srcDir).filter(_.getPath.getName.startsWith("part-"))
      require(srcs.length == 1,
        s"expected exactly one staged file in $srcDir, found ${srcs.length}")
      // encoded layout: the encoder's directory (possibly nested,
      // `year=.../month=...`); default layout: partition=<p>
      val destDir = new Path(s"$outDir/$t/" +
        (if (encodedOf.isDefined) enc else s"partition=$p"))
      fs.mkdirs(destDir)
      // planned-range naming override (compaction): the output claims
      // the GROUP's name span, not the surviving rows' min/max — a
      // zero-row member (an erasure keeper) must widen the name, never
      // let the output collide with a live input (see rewriteGroups)
      val (ns, ne) = nameBounds.getOrElse((p, i), (s, e))
      require(ns <= s && e <= ne,
        s"name-bounds override [$ns,$ne] does not cover rows [$s,$e]")
      val dest = new Path(destDir, FileNaming.encodeName(t, p.toInt, ns, ne, ext, pad))
      // idempotent redo: a file already committed under this exact
      // offset range is the same data — skip, like FSWAL.apply. A
      // rename failure returns false (it does not throw) — surfacing it
      // here is what keeps "committed" truthful; swallowing it would
      // advance the stream checkpoint past data that never landed.
      // IOException, not require: this is an ENVIRONMENT failure, the
      // class Retry.withBackoff re-runs (IllegalArgumentException is
      // its deterministic-config fast-fail).
      if (!fs.exists(dest) && !fs.rename(srcs.head.getPath, dest))
        throw new java.io.IOException(
          s"rename failed: ${srcs.head.getPath} -> $dest")
      CommittedFile(t, p, i, ns, ne, dest.toString)
    }
    fs.delete(new Path(staged), true)
    committed
  }

  /** Legal topic-name charset (Kafka's own): keeps the dynamic
    * `topic=` staging directory free of path-escaping surprises. */
  private val TopicName = "[A-Za-z0-9._-]+".r

  /** Multi-topic batch write: every topic in one pass. `df` is shaped
    * (topic, part, off, payload...); size rotation keys on
    * (topic, part) and the staging job writes ONE dynamic-partition
    * layout keyed (topic, part, file_idx) — job count stays O(1) in
    * topic count (stage + manifest), vs one write per topic when
    * looping [[write]]. The reference's `DataWriter.write` demux
    * (`DataWriter.java:347-353`) has the same single-pass shape, one
    * buffer per TopicPartition. Commit renames are per (topic,
    * partition, file) metadata ops, linear in file count.
    *
    * The returned manifest covers ALL topics — callers owning
    * per-topic atomicity domains (e.g. one CommitLog per topic) group
    * it by `.topic` and publish per topic. */
  def writeMulti(df: DataFrame, outDir: String, flushSize: Int,
                 pad: Int = FileNaming.DefaultZeroPadWidth,
                 format: String = "parquet",
                 rotationBucket: Option[org.apache.spark.sql.Column] = None,
                 dropAfterRotation: Seq[String] = Nil)
      : Seq[CommittedFile] = {
    if (format == "avro")
      throw new IllegalArgumentException(
        "avro multi-topic writes go through AvroSink per topic")
    // rotation: the same bucket-CHANGE file split the single-topic
    // encoded path runs (disjoint contiguous offset ranges even under
    // out-of-order event time), keyed per (topic, part) — each task
    // still sees one writer-unit's slice of the batch.
    // `dropAfterRotation` removes routing-only columns (the text
    // format's record-time source) AFTER the bucket expression read
    // them — the single-topic cfg.write text discipline.
    val sized0 = rotationBucket match {
      case Some(bucket) => Rotation.withBucketChangeFileIndex(df,
        Seq(col("topic"), col("part")), col("off"), bucket, flushSize)
      case scala.None => Rotation.withSizeFileIndex(df,
        Seq(col("topic"), col("part")), col("off"), flushSize)
    }
    val sized = if (dropAfterRotation.isEmpty) sized0
                else sized0.drop(dropAfterRotation.distinct: _*)
    // fixed staging path, like the per-topic `+tmp/<topic>` dirs: the
    // overwrite-mode staging write wipes a crashed predecessor's
    // leftovers instead of leaking uuid dirs. Discipline: one
    // multi-topic writer per store, the same one-writer-per-staging-dir
    // rule the per-topic path already implies. `+multi`, not a
    // topic-legal name: the charset [A-Za-z0-9._-] admits ".multi",
    // so a topic of that name would share (and wipe) this directory
    stageAndCommit(sized, outDir, s"$outDir/+tmp/+multi",
      topicOf = Some("topic"), topic = "", pad = pad, format = format)
  }

  /** [[resumeFrom]] with per-topic committed maps: one broadcast join
    * keyed (topic, part) filters the whole mixed stream in a single
    * pass — no per-topic slicing. */
  def resumeFromMulti(df: DataFrame,
                      committed: Map[String, Map[Long, Long]]): DataFrame = {
    val rows = committed.toSeq.flatMap { case (t, m) =>
      m.toSeq.map { case (p, o) => (t, p, o) }
    }
    if (rows.isEmpty) return df
    val spark = df.sparkSession
    import spark.implicits._
    val offs = rows.toDF("topic", "part", "__max_committed")
    df.join(broadcast(offs), Seq("topic", "part"), "left")
      .filter(col("__max_committed").isNull || col("off") > col("__max_committed"))
      .drop("__max_committed")
  }

  /** Formats compaction can read back with their own schema and the
    * `off` column intact (csv drops names without a header; text
    * carries offsets only in the filename). */
  private[graft] val SelfDescribing = Set("parquet", "json", "orc")

  /** One committed file in the compaction manifest (offsets parsed
    * from its name). */
  final case class CompactFile(partition: Long, start: Long, end: Long,
                               name: String)

  /** One planned output file: a run of contiguous source files. */
  final case class CompactGroup(partition: Long, start: Long, end: Long,
                                files: Seq[String])

  /** The compaction plan: files to delete up front (healing) and the
    * grouping of the survivors. */
  final case class CompactionPlan(subsumed: Seq[CompactFile],
                                  groups: Seq[CompactGroup])

  /** Pure compaction planner (property-tested separately from the
    * filesystem side effects).
    *
    * Healing: a file whose offset range lies inside another committed
    * file's range is a leftover source from a compaction that crashed
    * in its commit→delete window — every record it holds is already in
    * the containing file, so it is deleted before grouping. That makes
    * the surviving ranges disjoint, so a re-run can never regroup a
    * compacted file with its own sources (which would duplicate
    * records, or delete a file acting as its own skipped
    * "replacement"). Overlap is always full containment because every
    * committed range is a union of whole predecessor ranges.
    *
    * Grouping: greedy accumulation of contiguous survivors until the
    * group spans ≥ `targetRecords` offsets (dense per-partition
    * offsets ⇒ records = end − start + 1); the tail stays as an
    * undersized group. */
  private[graft] def planCompaction(listed: Seq[CompactFile],
                                     targetRecords: Long): CompactionPlan = {
    val subsumed = Seq.newBuilder[CompactFile]
    val groups = Seq.newBuilder[CompactGroup]
    listed.groupBy(_.partition).toSeq.sortBy(_._1).foreach { case (p, files) =>
      val kept = Seq.newBuilder[CompactFile]
      var maxEnd = -1L
      files.sortBy(f => (f.start, -f.end)).foreach { f =>
        if (f.end <= maxEnd) subsumed += f
        else {
          // the healing premise is containment-only overlap (the sort
          // makes any f.end <= maxEnd a containment); a PARTIAL overlap
          // means this is not a default-layout topic — encoded
          // partition dirs interleave a partition's offsets — and
          // deleting "subsumed" files there would destroy live data,
          // so refuse instead of healing
          require(f.start > maxEnd,
            s"partially overlapping ranges in partition $p " +
              s"(..$maxEnd vs [${f.start}..${f.end}]) — " +
              "not a compactable default-layout topic")
          kept += f; maxEnd = f.end
        }
      }
      var start = -1L
      var end = -1L
      var acc = 0L
      var names = List.empty[String]
      kept.result().foreach { f =>
        if (names.isEmpty) start = f.start
        names = f.name :: names
        end = f.end
        // size by the SUM of per-file name spans, not end − start of
        // the group: an offset gap between files (Kafka retention
        // expiry, erasure) holds no records — counting it would close
        // chronically undersized groups on gappy topics. The OUTPUT
        // name still spans the whole group (gaps claim no data and
        // keep resume coverage monotone).
        acc += f.end - f.start + 1
        if (acc >= targetRecords) {
          groups += CompactGroup(p, start, end, names.reverse)
          names = Nil
          acc = 0L
        }
      }
      if (names.nonEmpty) groups += CompactGroup(p, start, end, names.reverse)
    }
    CompactionPlan(subsumed.result(), groups.result())
  }

  /** Small-files compaction — the maintenance operation every
    * flush-size-bounded streaming sink needs at scale (a year of
    * micro-batches = millions of small files; NameNode metadata and
    * scan-task scheduling both degrade). Merges runs of CONTIGUOUS
    * committed files per partition into files of ≥ `targetRecords`
    * records, preserving the offset-ranged naming and the idempotent
    * commit protocol:
    *
    *  - grouping is pure offset arithmetic over the filename manifest
    *    (driver-side, linear in file count — metadata plane, no data);
    *  - only multi-file groups are read (explicit file list, not a
    *    full-topic scan) and rewritten through [[writeAssigned]] in ONE
    *    Spark job (group index = file_idx, so the shuffle key equals
    *    the output layout);
    *  - sources are deleted only AFTER their replacement committed, so
    *    a crash anywhere is healed by re-running: the compacted range
    *    is skipped idempotently and leftover sources are re-deleted.
    *
    * Readers that scan the directory during the commit→delete window
    * can observe a compacted file alongside its sources (overlapping
    * offsets) — run compaction writer-exclusive per topic, the same
    * discipline the reference's one-writer-per-partition model implies.
    * A transactional metadata-log sink is the upgrade that removes the
    * window entirely.
    *
    * `format` must be one that retains the `off` column AND reads back
    * with its schema — parquet or json (csv drops column names without
    * a header; text carries offsets only in the filename). */
  def compact(spark: SparkSession, outDir: String, topic: String,
              targetRecords: Long, pad: Int = FileNaming.DefaultZeroPadWidth,
              format: String = "parquet"): Seq[CommittedFile] = {
    require(SelfDescribing(format),
      s"compact needs a self-describing format retaining off, got: $format")
    val fs = FileSystem.get(new Path(outDir).toUri,
      spark.sparkContext.hadoopConfiguration)
    def srcPath(p: Long, name: String) =
      new Path(s"$outDir/$topic/partition=$p/$name")

    val re = FileNaming.CommittedFilenameRegex.r
    val listed = listCommittedRel(spark, outDir, topic).flatMap { rel =>
      rel.split('/').last match {
        case n @ re(t, p, s, e, _) if t == topic =>
          // default-layout guard: compaction reconstructs source paths
          // as partition=<p>/<name>; an encoded layout (field/daily/...
          // directories) would no-op the deletes and fail mid-rewrite —
          // refuse up front instead
          require(rel == s"partition=$p/$n",
            s"'$rel' is not in the default partition=<p> layout — " +
              "encoded-partition topics are not compactable")
          Some(CompactFile(p.toLong, s.toLong, e.toLong, n))
        case _ => None
      }
    }
    val plan = planCompaction(listed, targetRecords)
    plan.subsumed.foreach(f => fs.delete(srcPath(f.partition, f.name), false))
    val multi = plan.groups.filter(_.files.size > 1)
    if (multi.isEmpty) return Seq.empty

    val committed = rewriteGroups(spark, outDir, topic, multi, pad, format)

    // replacements are durable — now drop the merged sources
    multi.foreach(g => g.files.foreach(n => fs.delete(srcPath(g.partition, n), false)))
    committed
  }

  /** Load an explicit committed-file list back into the stream schema
    * (`partition=` dir value → long `part`). Shared by the two compact
    * paths and the CommitLog snapshot reader — the rename/cast pair is
    * subtle enough to exist exactly once. */
  private[graft] def loadCommitted(spark: SparkSession, baseDir: String,
                                    format: String,
                                    paths: Seq[String]): DataFrame =
    // mergeSchema: a topic's schema can EVOLVE mid-stream (the
    // schema-change rotation path writes the new shape into the same
    // topic), so the read schema must be the UNION of the read set's
    // file schemas — without it the reader samples one footer and
    // silently drops evolved columns, and a DML rewrite would then
    // destroy them in every file it touches. Per-read-set union also
    // keeps DML schema-preserving: survivors of pre-evolution files
    // rewrite in their own shape. (Parquet/ORC honor the option; json
    // infers across files anyway; csv/text carry no schema.) Cost:
    // one distributed footer-merge pass over the read set — measured
    // within run-to-run noise, and pruned reads (DML, index probes)
    // touch few files; if a 100k-file full scan ever makes this the
    // bottleneck, the escape hatch is recording the schema per log
    // version and passing it explicitly.
    spark.read.option("basePath", baseDir).option("mergeSchema", "true")
      .format(format).load(paths: _*)
      .withColumnRenamed("partition", "part")
      // partition-dir discovery infers int; the stream schema is long
      .withColumn("part", col("part").cast("long"))

  /** One job: read only the files being merged, assign group index by
    * offset range (broadcast ranges), and commit through the standard
    * staging + rename protocol. Shared by listing- and log-based
    * compaction. */
  private[ingest] def rewriteGroups(spark: SparkSession, outDir: String,
                                    topic: String, multi: Seq[CompactGroup],
                                    pad: Int,
                                    format: String): Seq[CommittedFile] = {
    val paths = multi.flatMap(g =>
      g.files.map(n => s"$outDir/$topic/partition=${g.partition}/$n"))
    val data = loadCommitted(spark, s"$outDir/$topic", format, paths)
    import spark.implicits._
    val ranges = multi.zipWithIndex
      .map { case (g, i) => (g.partition, g.start, g.end, i.toLong) }
      .toDF("part", "__gs", "__ge", "file_idx")
    val assigned = data.join(broadcast(ranges), Seq("part"))
      .filter(col("off").between(col("__gs"), col("__ge")))
      .drop("__gs", "__ge")
    // outputs are NAMED by the planned group span, not the surviving
    // rows' min/max: a zero-row group member (a deleteWhere erasure
    // keeper pinning a shrunk partition max) would otherwise let the
    // output name collide with a live input — the publish would then
    // add and remove the same relative path in one version, which
    // replay nets to REMOVAL (silent data loss) — and merging a
    // keeper must carry its offset coverage into the merged name so
    // resume recovery (maxCommittedOffsets) never shrinks
    val spans = multi.zipWithIndex.map { case (g, i) =>
      (g.partition, i.toLong) -> (g.start, g.end)
    }.toMap
    stageAndCommit(assigned, outDir, s"$outDir/+tmp/$topic",
      topicOf = None, topic = topic, pad = pad, format = format,
      nameBounds = spans)
  }

  /** Recursive committed-file listing (B10, `FileUtils.java:151-221`):
    * depth-first under `<outDir>/<topic>`, committed names only. */
  def listCommitted(spark: SparkSession, outDir: String, topic: String): Seq[String] =
    listCommittedRel(spark, outDir, topic).map(_.split('/').last).sorted

  /** [[listCommitted]] with topic-relative paths (`<dirs...>/<name>`) —
    * what layout-sensitive callers (compaction's default-layout guard)
    * need. */
  private[ingest] def listCommittedRel(spark: SparkSession, outDir: String,
                                       topic: String): Seq[String] = {
    val fs = FileSystem.get(new Path(s"$outDir/$topic").toUri,
      spark.sparkContext.hadoopConfiguration)
    // qualify BEFORE taking the prefix: listFiles returns qualified
    // absolute paths, so an unqualified (e.g. relative) root would
    // never strip and every "relative" path would come back absolute
    val root = fs.makeQualified(new Path(s"$outDir/$topic"))
    if (!fs.exists(root)) return Seq.empty
    val rootUri = root.toUri.getPath
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.matches(FileNaming.CommittedFilenameRegex))
        out += p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
    }
    out.result().sorted
  }

  /** Offset restore (A21/B11, `FileUtils.java:106-149`): max committed
    * end offset per kafka partition, from filenames alone. */
  def maxCommittedOffsets(spark: SparkSession, outDir: String, topic: String): Map[Long, Long] = {
    val re = FileNaming.CommittedFilenameRegex.r
    listCommitted(spark, outDir, topic).flatMap {
      case re(t, p, _, e, _) if t == topic => Some(p.toLong -> e.toLong)
      case _ => None
    }.groupMapReduce(_._1)(_._2)(math.max)
  }

  /** Resume filter: drop records at or below each partition's committed
    * offset (the `context.offset(tp, max+1)` rewind,
    * `TopicPartitionWriter.java:611-634`). Broadcast join — the offsets
    * map has one row per partition. */
  def resumeFrom(df: DataFrame, committed: Map[Long, Long]): DataFrame = {
    if (committed.isEmpty) return df
    val spark = df.sparkSession
    import spark.implicits._
    val offs = committed.toSeq.toDF("part", "__max_committed")
    df.join(broadcast(offs), Seq("part"), "left")
      .filter(col("__max_committed").isNull || col("off") > col("__max_committed"))
      .drop("__max_committed")
  }

  /** Read the committed dataset back (partition pruning via the
    * `partition=` directory layout; renamed to the stream schema's
    * `part` so write→read roundtrips are symmetric). Schema readers
    * B5–B7: parquet carries its own schema (footer), json infers,
    * csv/text take `schema` (or fall back to inference/lines). */
  def read(spark: SparkSession, outDir: String, topic: String,
           format: String = "parquet",
           schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read.format(format)
    schema.foreach(reader.schema)
    reader.load(s"$outDir/$topic").withColumnRenamed("partition", "part")
  }
}
