package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: lay a corpus of
  * token-counted documents end-to-end on a global token axis and cut
  * it into fixed-size context windows ("bins"). A document's bin is
  * the window its FIRST token lands in — the GPT-style concat-then-
  * chunk packing, where documents may straddle window boundaries.
  *
  * The global token offset is a running sum over the corpus order —
  * the textbook formulation is one `Window.orderBy(id)` over the whole
  * corpus, which executes as a SINGLE task and is exactly the straggler
  * this module exists to avoid. Instead, a two-level distributed
  * prefix sum (the same shape `ingest/Rotation` uses for size
  * rotation):
  *
  *   1. shard by `id div shardSpan` — per-shard prefix sums run as a
  *      bounded window per shard (shardSpan caps the rows any one task
  *      sorts);
  *   2. shard TOTALS (n/shardSpan rows — metadata scale) get their own
  *      prefix sum; that tiny frame is the only single-task window;
  *   3. broadcast the shard offsets back and add.
  *
  * At 100 TB with shardSpan=1e6 the single-task window sees ~1e5 rows
  * of (shard, total) while every corpus-sized operation stays fully
  * parallel.
  *
  * Contract: `idCol` is a non-negative long, unique per row; corpus
  * order is ascending id. All arithmetic is long-exact (`sum` over
  * longs, SQL `div` for the bin) — offsets are correct up to long
  * overflow at 2^63 total tokens.
  */
object Packing {

  /** Adds `tok_start` — the exclusive running sum of `weightCol` in
    * ascending `idCol` order — via the two-level prefix sum. */
  def withTokenOffsets(df: DataFrame, idCol: String, weightCol: String,
                       shardSpan: Long): DataFrame = {
    require(shardSpan > 0, s"shardSpan must be positive, got $shardSpan")
    // same output-collision guard as Shuffle's pos/shard: silently
    // clobbering a caller's tok_start would corrupt their data
    require(!df.columns.contains("tok_start"),
      "input already carries a tok_start column")
    // collision-safe internal names: a caller's own `shard` column must
    // survive untouched
    val sharded = df.withColumn("__pack_shard", expr(s"$idCol div $shardSpan"))
    // within-shard exclusive prefix: bounded by shardSpan rows per task
    val wLocal = Window.partitionBy(col("__pack_shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = sharded.withColumn("__pack_local_off",
      coalesce(sum(col(weightCol)).over(wLocal), lit(0L)))
    // shard totals: one row per shard — the metadata-scale frame
    val wShard = Window.orderBy(col("__pack_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardOffsets = sharded.groupBy(col("__pack_shard"))
      .agg(sum(col(weightCol)).as("__pack_shard_total"))
      .withColumn("__pack_shard_off",
        coalesce(sum(col("__pack_shard_total")).over(wShard), lit(0L)))
      .select(col("__pack_shard"), col("__pack_shard_off"))
    withLocal.join(broadcast(shardOffsets), Seq("__pack_shard"))
      .withColumn("tok_start",
        (col("__pack_shard_off") + col("__pack_local_off")).cast("long"))
      .drop("__pack_shard", "__pack_local_off", "__pack_shard_off")
  }

  /** [[withTokenOffsets]] plus the context-window assignment:
    * `bin = tok_start div ctxTokens`. */
  def packBins(df: DataFrame, idCol: String, weightCol: String,
               ctxTokens: Long, shardSpan: Long): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens must be positive, got $ctxTokens")
    withTokenOffsets(df, idCol, weightCol, shardSpan)
      .withColumn("bin", expr(s"tok_start div $ctxTokens"))
  }
}
