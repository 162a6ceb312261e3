package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle for training-data assembly: order the
  * corpus by a content/id-keyed hash (a reproducible permutation — the
  * "global shuffle" every pretraining run does before sharding, salted
  * per epoch) and assign each row its global shuffled position and
  * shard.
  *
  * The textbook position is `row_number() OVER (ORDER BY h)` — a
  * single-task sort of the whole corpus, the exact straggler
  * `operators/Packing` documents. Instead, the same two-level shape,
  * with one twist: because `h` is a UNIFORM 60-bit hash, equal-width
  * RANGE buckets over the hash space are balanced without sampling
  * (a general sort needs range sampling first — Spark's
  * `repartitionByRange`; a hash column gets it for free):
  *
  *   1. bucket `b = h div (2^60 / buckets)` — per-bucket ranks run as
  *      a bounded window per bucket (~n/buckets rows per task);
  *   2. bucket COUNTS (one row per bucket — metadata scale) get the
  *      only unpartitioned window;
  *   3. broadcast the bucket offsets back: pos = offset + local rank.
  *
  * At 100 TB with buckets=4096, the single-task window sees 4096
  * count rows while every corpus-sized operation stays fully parallel.
  * Production then writes shard files with
  * `repartitionByRange(col("shard"), col("h")).sortWithinPartitions`
  * — positions stay implicit in file order; this operator is the
  * explicit-position form the manifest/oracle checks.
  *
  * Contract: `hashCol` is a long in [0, 2^60) (TextFunctions.hash60's
  * range), `tieCol` makes (hashCol, tieCol) unique per row.
  */
object Shuffle {

  /** Adds `pos` — the 0-based global rank of `(hashCol, tieCol)` —
    * via the two-level distributed ranking. */
  def withShufflePosition(df: DataFrame, hashCol: String, tieCol: String,
                          buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(!df.columns.contains("pos"),
      "input already has a 'pos' column — rename it before ranking")
    val span = (1L << 60) / buckets
    // least() guards the degenerate top-of-range value; collision-safe
    // internal names so the caller's OTHER columns survive untouched
    val b = df.withColumn("__shuf_bucket",
      least(expr(s"$hashCol div ${span}L"), lit(buckets - 1L)))
    // exclusive running count, not row_number(): RowNumber is
    // int-typed and would silently wrap past 2^31-1 rows in a bucket —
    // the sum stays long-exact at any per-bucket size (Packing's rule)
    val wLocal = Window.partitionBy(col("__shuf_bucket"))
      .orderBy(col(hashCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = b.withColumn("__shuf_local",
      coalesce(sum(lit(1L)).over(wLocal), lit(0L)))
    // bucket counts: one row per bucket — the metadata-scale frame
    val wBucket = Window.orderBy(col("__shuf_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col("__shuf_bucket"))
      .agg(count(lit(1)).as("__shuf_n"))
      .withColumn("__shuf_off",
        coalesce(sum(col("__shuf_n")).over(wBucket), lit(0L)))
      .select(col("__shuf_bucket"), col("__shuf_off"))
    withLocal.join(broadcast(offsets), Seq("__shuf_bucket"))
      .withColumn("pos", col("__shuf_off") + col("__shuf_local"))
      .drop("__shuf_bucket", "__shuf_local", "__shuf_off")
  }

  /** Curriculum ordering: the 0-based global rank of
    * `(stageCol ASC, hashCol, tieCol)` — stages in order, a
    * deterministic shuffle WITHIN each stage. The two-level shape
    * generalizes: buckets are (stage, hash-range), per-bucket ranks
    * stay bounded windows, and the only unpartitioned window runs over
    * the (stages × buckets) count frame — still metadata-scale (a
    * curriculum has a handful of stages). `stageCol` must be a
    * non-null integer; same hash/tie contract as
    * [[withShufflePosition]]. */
  def withStagedPosition(df: DataFrame, stageCol: String, hashCol: String,
                         tieCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(!df.columns.contains("pos"),
      "input already has a 'pos' column — rename it before ranking")
    val span = (1L << 60) / buckets
    val b = df.withColumn("__shuf_bucket",
      least(expr(s"$hashCol div ${span}L"), lit(buckets - 1L)))
    val wLocal = Window
      .partitionBy(col(stageCol), col("__shuf_bucket"))
      .orderBy(col(hashCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = b.withColumn("__shuf_local",
      coalesce(sum(lit(1L)).over(wLocal), lit(0L)))
    val wBucket = Window.orderBy(col(stageCol), col("__shuf_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col(stageCol), col("__shuf_bucket"))
      .agg(count(lit(1)).as("__shuf_n"))
      .withColumn("__shuf_off",
        coalesce(sum(col("__shuf_n")).over(wBucket), lit(0L)))
      .select(col(stageCol), col("__shuf_bucket"), col("__shuf_off"))
    withLocal.join(broadcast(offsets), Seq(stageCol, "__shuf_bucket"))
      .withColumn("pos", col("__shuf_off") + col("__shuf_local"))
      .drop("__shuf_bucket", "__shuf_local", "__shuf_off")
  }

  /** [[withShufflePosition]] plus the shard cut:
    * `shard = pos div rowsPerShard` — equal-size shards in shuffled
    * order, the unit a training job reads. */
  def withShards(df: DataFrame, hashCol: String, tieCol: String,
                 buckets: Int, rowsPerShard: Long): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it before sharding")
    withShufflePosition(df, hashCol, tieCol, buckets)
      .withColumn("shard", expr(s"pos div ${rowsPerShard}L"))
  }
}
