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
        "mix layouts; choose a fresh topic")
    val src = CommitLog.read(spark, outDir, srcTopic, format)
    require(!cols.contains("part") && !cols.contains("off"),
      "cluster on data columns; part/off are log coordinates")
    val data = src
      .withColumnRenamed("part", "src_part")
      .withColumnRenamed("off", "src_off")
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val arranged = withZValue(data, cols, bits)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      // spark_partition_id / monotonically_increasing_id are
      // nondeterministic to the optimizer, so this project cannot be
      // reordered above the sort; the low 33 bits of the id are the
      // per-partition row counter — curve order within the partition
      .withColumn("part", spark_partition_id().cast("long"))
      .withColumn("off",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .drop("__z")
    CommitLog.writeLogged(arranged, outDir, dstTopic, flushSize,
      format = format, statsCols = cols)
  }
}
