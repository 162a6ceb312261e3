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

  /** Write a stream-shaped frame (`part`, `off`, payload columns) as
    * committed offset-ranged parquet. Returns the commit manifest. */
  def write(df: DataFrame, outDir: String, topic: String, flushSize: Int,
            pad: Int = FileNaming.DefaultZeroPadWidth): Seq[CommittedFile] = {
    val spark = df.sparkSession
    val sized = Rotation.withSizeFileIndex(df, Seq(col("part")), col("off"), flushSize)
    val staged = s"$outDir/+tmp/$topic"

    // Stage: exactly one file per (part, file_idx) — the repartition key
    // equals the directory key, so each dynamic partition is written by
    // a single task.
    sized.repartition(col("part"), col("file_idx"))
      .sortWithinPartitions(col("part"), col("file_idx"), col("off"))
      .write.mode("overwrite").partitionBy("part", "file_idx").parquet(staged)

    val manifest = sized.groupBy(col("part"), col("file_idx"))
      .agg(min(col("off")).as("s"), max(col("off")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    val fs = FileSystem.get(new Path(outDir).toUri, spark.sparkContext.hadoopConfiguration)
    val committed = manifest.toSeq.map { case (p, i, s, e) =>
      val srcDir = new Path(s"$staged/part=$p/file_idx=$i")
      val srcs = fs.listStatus(srcDir).filter(_.getPath.getName.startsWith("part-"))
      require(srcs.length == 1,
        s"expected exactly one staged file in $srcDir, found ${srcs.length}")
      val destDir = new Path(s"$outDir/$topic/partition=$p")
      fs.mkdirs(destDir)
      val dest = new Path(destDir, FileNaming.encodeName(topic, p.toInt, s, e, ".parquet", pad))
      // idempotent redo: a file already committed under this exact
      // offset range is the same data — skip, like FSWAL.apply
      if (!fs.exists(dest)) fs.rename(srcs.head.getPath, dest)
      CommittedFile(topic, p, i, s, e, dest.toString)
    }
    fs.delete(new Path(s"$outDir/+tmp"), true)
    committed
  }

  /** Recursive committed-file listing (B10, `FileUtils.java:151-221`):
    * depth-first under `<outDir>/<topic>`, committed names only. */
  def listCommitted(spark: SparkSession, outDir: String, topic: String): Seq[String] = {
    val root = new Path(s"$outDir/$topic")
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (f.matches(FileNaming.CommittedFilenameRegex)) out += f
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
    * `part` so write→read roundtrips are symmetric). */
  def read(spark: SparkSession, outDir: String, topic: String): DataFrame =
    spark.read.parquet(s"$outDir/$topic").withColumnRenamed("partition", "part")
}
