package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) CLUSTERING for logged topics — the
  * `OPTIMIZE ZORDER BY` of this engine's lakehouse plane. Multi-column
  * data skipping needs files whose per-column min/max ranges are TIGHT
  * on every query column at once; a single-column sort gives one tight
  * column and leaves the rest at full span. Interleaving the bits of
  * equi-depth bucket ranks puts rows that are close in ALL cluster
  * dimensions into the same files, so the [[FileStats]] plane refutes
  * predicates on any clustered column (or any conjunction of them) for
  * most files.
  *
  * Scale shape: one `approxQuantile` pass computes per-column
  * boundaries (driver gets a few hundred doubles, never data); bucket
  * lookup is a BALANCED when-tree — O(log buckets) comparisons per
  * row, whole-stage-codegen'd, no UDF; the rewrite is ONE range
  * shuffle on the z-value plus a per-partition sort, exactly the cost
  * any clustering rewrite pays. The result commits through
  * [[CommitLog.writeLogged]] with `statsCols` = the cluster columns,
  * so the skipping plane is installed with the same atomic publish.
  *
  * Layout contract: the clustered copy is a NEW topic (the reference
  * engine's files are offset-addressed by NAME — `FileNaming`, per
  * `TopicPartitionWriter.java`'s commit protocol — so re-ordering rows
  * inside an existing topic would lie about offsets). Destination
  * `part` is the z-range id and `off` the position along the curve;
  * the source coordinates ride along as `src_part`/`src_off`, keeping
  * the provenance join available. This mirrors how production
  * lakehouses do it too: OPTIMIZE rewrites files and swaps pointers,
  * readers flip atomically.
  */
object ZOrder {

  /** Equi-depth buckets per cluster column (2^6): resolution well
    * above any realistic live-file count, while the lookup tree stays
    * 6 comparisons deep. */
  val DefaultBits = 6

  /** Balanced search tree counting how many cut points are <= v —
    * the equi-depth bucket rank, O(log n) comparisons per row. */
  private def bucketTree(v: Column, cuts: Array[Double], lo: Int,
                         hi: Int, base: Int): Column =
    if (lo >= hi) lit(base)
    else {
      val mid = (lo + hi) / 2
      when(v < lit(cuts(mid)), bucketTree(v, cuts, lo, mid, base))
        .otherwise(bucketTree(v, cuts, mid + 1, hi, base + (mid - lo) + 1))
    }

  /** Morton interleave of per-column bucket ranks — delegates to
    * [[graft.operators.ZOrder.interleaveN]], the one Morton home (the
    * operators side also carries the raw-coordinate layout report
    * `zorder_scan_pruning` and the pluggable write-path partitioner;
    * THIS side turns the same curve into a committed file layout with
    * its skipping plane). */
  def mortonInterleave(buckets: Seq[Column], bits: Int = DefaultBits): Column =
    graft.operators.ZOrder.interleaveN(buckets, bits)

  /** Order-preserving double proxy for a cluster column. Numerics cast
    * directly; timestamps become epoch seconds; dates route through
    * timestamp (a bare date→double cast silently nulls). Strings map
    * to their first six UTF-8 bytes read as an unsigned integer —
    * UTF-8 byte order IS code-point order, truncation/right-NUL-pad
    * keep the map monotone (non-strict), and 48 bits sit exactly in a
    * double — resolution far beyond any realistic bucket count. */
  private def orderProxy(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampType}
    dt match {
      case StringType =>
        conv(hex(substring(encode(rpad(c, 8, "\u0000"), "UTF-8"), 1, 6)),
          16, 10).cast("double")
      case DateType => c.cast(TimestampType).cast("double")
      case _ => c.cast("double")
    }
  }

  /** Add the z-value column: per-column equi-depth bucket rank
    * (boundaries from ONE multi-column `approxQuantile` pass, nulls
    * rank first like a SQL sort) interleaved into a Morton code.
    * Cluster columns may be numeric, date/timestamp, or string
    * (strings bucket by their leading-bytes order proxy — domains,
    * URLs, language tags cluster fine; only columns whose first six
    * bytes are all equal degenerate to one bucket). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = DefaultBits,
                 as: String = "__z"): DataFrame = {
    require(cols.nonEmpty && cols.size <= 8, s"1..8 cluster columns, got ${cols.size}")
    require(bits >= 1 && bits <= 10, s"bits must be 1..10, got $bits")
    require(cols.size * bits <= 63,
      s"${cols.size} columns x $bits bits exceed a Long's 63 usable " +
        "interleave positions — lower bits (resolution beyond the live " +
        "file count buys nothing)")
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val dts = cols.map(c => c -> df.schema(c).dataType).toMap
    // one pass over the data for ALL columns' boundaries; 0.01 relative
    // error is far finer than the bucket width at any realistic scale
    val proxies = cols.map(c => orderProxy(col(c), dts(c)).as(s"__zq_$c"))
    val quantileInput = df.select(proxies: _*)
    val cutsPerCol = quantileInput.stat
      .approxQuantile(cols.map(c => s"__zq_$c").toArray, probs, 0.01)
    val bucketCols = cols.zip(cutsPerCol).map { case (c, cuts) =>
      val v = orderProxy(col(c), dts(c))
      // duplicate cuts under skew just merge buckets — harmless
      val tree = bucketTree(v, cuts, 0, cuts.length, 0)
      when(v.isNull, lit(0)).otherwise(tree).cast("long")
    }
    df.withColumn(as, mortonInterleave(bucketCols, bits))
  }

  /** Rewrite `srcTopic`'s snapshot into NEW topic `dstTopic`, clustered
    * along the z-curve of `cols`: range-shuffle on the z-value (each
    * destination partition owns a contiguous curve segment), sort
    * within partitions, assign curve-order `part`/`off`, commit with
    * the skipping plane for `cols` installed in the same publish.
    * Refuses an existing destination (same guard as index builds —
    * appending a second layout into a topic would corrupt both).
    * Returns the destination's publish version. */
  def cluster(spark: SparkSession, outDir: String, srcTopic: String,
              dstTopic: String, cols: Seq[String],
              flushSize: Int, numParts: Int = 0,
              bits: Int = DefaultBits,
              format: String = "parquet"): Long = {
    require(dstTopic != srcTopic, "cluster into a NEW topic")
    require(CommitLog.latestVersion(spark, outDir, dstTopic) < 0,
      s"destination topic '$dstTopic' already has a log — refusing to " +
        "mix layouts; choose a fresh topic (recluster refreshes one)")
    val arranged = arrange(spark, outDir, srcTopic, cols, numParts, bits,
      format, partBase = 0L)
    CommitLog.writeLogged(arranged, outDir, dstTopic, flushSize,
      format = format, statsCols = cols)
  }

  /** REFRESH an existing clustered copy from its source — the
    * maintenance tick that keeps the layout serving while the source
    * grows or takes DML. The new generation lands in partition ids
    * ABOVE every id the destination has ever used (committed names are
    * immutable claims, and the generation offset keeps redo staging
    * from ever colliding with a published file), then ONE atomic
    * publish adds the new layout and removes the old — readers flip
    * between complete generations, `commitlog_history` shows the
    * recluster as one version, and the superseded files age out via
    * vacuum like any swap source. Cluster columns default to the set
    * the destination's stats plane recorded at [[cluster]] time.
    * Crash-safe: a failure before the publish leaves only unpublished
    * staging (purged by the committer's pre-flight on redo, reclaimed
    * by vacuum otherwise); the swap itself is one rename. */
  def recluster(spark: SparkSession, outDir: String, srcTopic: String,
                dstTopic: String, cols: Seq[String] = Nil,
                flushSize: Int = 1 << 14, numParts: Int = 0,
                bits: Int = DefaultBits,
                format: String = "parquet"): Long = {
    require(dstTopic != srcTopic, "recluster refreshes a DERIVED copy")
    val live = CommitLog.snapshot(spark, outDir, dstTopic)
    require(live.nonEmpty,
      s"'$dstTopic' has no live clustered generation — run cluster() first")
    val ccols =
      if (cols.nonEmpty) cols
      else {
        val recorded = FileStats.read(spark, outDir, dstTopic)
          .valuesIterator.flatMap(_.keys).toSeq.distinct.sorted
          .filterNot(c => c == "part" || c == "off" ||
            c == "src_part" || c == "src_off")
        require(recorded.nonEmpty,
          s"'$dstTopic' records no cluster columns — pass cols explicitly")
        recorded
      }
    // generation base: above every partition id ever committed (live
    // or retained), so staged names can never collide with a
    // published file of an earlier generation
    val re = FileNaming.CommittedFilenameRegex.r
    val allParts = BatchWriter.listCommittedRel(spark, outDir, dstTopic)
      .flatMap(_.split('/').last match {
        case re(t, p, _, _, _) if t == dstTopic => Some(p.toLong)
        case _ => None
      })
    val partBase = if (allParts.isEmpty) 0L else allParts.max + 1L
    val arranged = arrange(spark, outDir, srcTopic, ccols, numParts, bits,
      format, partBase)
    val committed = BatchWriter.write(arranged, outDir, dstTopic,
      flushSize, format = format)
    val rels = committed.map(c =>
      s"partition=${c.partition}/${new org.apache.hadoop.fs.Path(c.path).getName}")
    val v = CommitLog.publish(spark, outDir, dstTopic,
      adds = rels, removes = live)
    // both skipping planes re-cover the new generation wholesale
    FileStats.install(spark, outDir, dstTopic, ccols, format)
    FileBloom.refresh(spark, outDir, dstTopic, format)
    v
  }

  /** ONE cron-schedulable tick for the clustered-copy lifecycle —
    * the layout counterpart of [[CommitLog.maintainDerived]]:
    * bootstrap ([[cluster]]) when the destination has no log yet,
    * refresh ([[recluster]]) ONLY when the source's log moved past
    * the watermark this tick last recorded, then the destination's
    * own [[CommitLog.maintain]] (compaction preserves curve
    * adjacency; truncation + vacuum reclaim superseded generations
    * once unpinned). The watermark is the max committed offset of a
    * companion marker topic — the filename-as-metadata contract
    * again, zero sidecar state. Crash ordering recluster-then-marker:
    * a crash between them re-reclusters once on the next tick
    * (wasteful, converges). `cols` is required only for the
    * bootstrap; afterwards the stats plane records it. */
  def maintainClustered(spark: SparkSession, outDir: String,
                        srcTopic: String, dstTopic: String,
                        cols: Seq[String] = Nil,
                        flushSize: Int = 1 << 14, numParts: Int = 0,
                        bits: Int = DefaultBits,
                        targetRecords: Long = 1L << 20,
                        graceMs: Long = 15 * 60 * 1000L,
                        format: String = "parquet"): Long = {
    import spark.implicits._
    val marker = s"${dstTopic}__zwm"
    val cur = CommitLog.latestVersion(spark, outDir, srcTopic)
    if (cur < 0) return -1L
    val fresh = CommitLog.latestVersion(spark, outDir, dstTopic) < 0
    val w = CommitLog.maxOffsets(spark, outDir, marker).getOrElse(0L, -1L)
    if (fresh) {
      require(cols.nonEmpty,
        s"bootstrap of '$dstTopic' needs the cluster columns")
      cluster(spark, outDir, srcTopic, dstTopic, cols, flushSize,
        numParts, bits, format)
      CommitLog.writeLogged(Seq((0L, cur)).toDF("part", "off"), outDir,
        marker, flushSize = 1, format = format)
    } else if (cur > w) {
      recluster(spark, outDir, srcTopic, dstTopic, cols, flushSize,
        numParts, bits, format)
      CommitLog.writeLogged(Seq((0L, cur)).toDF("part", "off"), outDir,
        marker, flushSize = 1, format = format)
    }
    CommitLog.maintain(spark, outDir, dstTopic, targetRecords, graceMs,
      format = format)
    // the watermark topic accrues one 1-row file per refresh tick —
    // sweep it too, or a long-lived cron grows it without bound
    if (CommitLog.latestVersion(spark, outDir, marker) >= 0)
      CommitLog.maintain(spark, outDir, marker, targetRecords, graceMs,
        format = format)
    CommitLog.latestVersion(spark, outDir, dstTopic)
  }

  /** The shared rewrite core: provenance-renamed source snapshot →
    * z-value → one range shuffle → per-partition sort → curve-order
    * (part, off) coordinates, with partition ids offset by
    * `partBase` (generation scoping for [[recluster]]). */
  private def arrange(spark: SparkSession, outDir: String,
                      srcTopic: String, cols: Seq[String], numParts: Int,
                      bits: Int, format: String,
                      partBase: Long): DataFrame = {
    require(!cols.contains("part") && !cols.contains("off"),
      "cluster on data columns; part/off are log coordinates")
    val src = CommitLog.read(spark, outDir, srcTopic, format)
    val data = src
      .withColumnRenamed("part", "src_part")
      .withColumnRenamed("off", "src_off")
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    withZValue(data, cols, bits)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      // spark_partition_id / monotonically_increasing_id are
      // nondeterministic to the optimizer, so this project cannot be
      // reordered above the sort; the low 33 bits of the id are the
      // per-partition row counter — curve order within the partition
      .withColumn("part", spark_partition_id().cast("long") + lit(partBase))
      .withColumn("off",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .drop("__z")
  }
}
