package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.ingest.{CommitLog, FileNaming}

/** Training-shard export — the lifecycle step AFTER curation: turn the
  * curated corpus into the files a training job actually reads.
  * Composes the engine's own primitives end-to-end: the deterministic
  * epoch shuffle ([[Shuffle.withShards]] — two-level ranking, never a
  * global corpus window), the write plane's temp→rename committer with
  * offset-ranged filenames, and the transactional commit log (readers
  * see a complete export or none of it).
  *
  * The mapping onto the write plane's envelope is exact: shard →
  * `part`, rank-within-shard → `off`, so every existing consumer —
  * committed-file filters, max-offset recovery, compaction, snapshot
  * reads — applies to training shards unchanged. With `flushSize =
  * rowsPerShard` each shard is exactly ONE file named
  * `topic+shard+first+last.<fmt>`.
  *
  * ONE export per topic: shard filenames depend only on (n,
  * rowsPerShard), so a second export into the same topic would collide
  * with the committer's idempotent skip-if-exists renames and publish
  * the OLD bytes under a new version. Epochs therefore go to separate
  * topics (`train_e0`, `train_e1`, …) — which is also what a training
  * run wants: immutable per-epoch inputs.
  */
object ShardExport {

  /** Column names the committed layout itself produces on read-back —
    * a payload column with one of these names would collide with
    * partition discovery and make the export unreadable. */
  private val Reserved = Set("part", "off", "partition", "topic")

  /** Shuffle `df` by the epoch-salted content hash of `idCol`, cut
    * into `rowsPerShard`-row shards, write one committed file per
    * shard under `outDir/topic` (which must be a FRESH topic), and
    * publish atomically. Returns the published log version, or -1
    * with nothing written/published when the curated input is empty.
    * Deterministic: same (input, epoch) ⇒ the same shards
    * byte-for-byte; a new epoch ⇒ a fresh permutation (in its own
    * topic). `idCol` must be non-null — among several null-id rows no
    * deterministic order exists, so they are rejected, not placed
    * arbitrarily. */
  def exportShards(df: DataFrame, outDir: String, topic: String,
                   idCol: String, epoch: Long, buckets: Int,
                   rowsPerShard: Long,
                   format: String = "parquet",
                   pad: Int = FileNaming.DefaultZeroPadWidth): Long = {
    require(rowsPerShard > 0 && rowsPerShard <= Int.MaxValue,
      s"rowsPerShard must fit an int flush size, got $rowsPerShard")
    val clash = df.columns.map(_.toLowerCase).toSet.intersect(Reserved)
    require(clash.isEmpty,
      s"input carries write-plane/read-back reserved column(s) " +
        s"${clash.mkString(", ")} — rename before export")
    require(CommitLog.latestVersion(df.sparkSession, outDir, topic) < 0,
      s"topic '$topic' already has committed versions — shard " +
        "filenames depend only on corpus size, so a re-export would " +
        "idempotently keep the OLD bytes; export each epoch to its " +
        "own fresh topic")
    // one validation aggregate before the heavy ranking: null ids
    // (no deterministic order exists for them) and the int bound on
    // the shard count (BatchWriter encodes the partition as int —
    // silent wrap would strand files outside the committed-name regex)
    val stats = df.agg(count(lit(1)).as("n"),
      count(when(col(idCol).isNull, 1)).as("nulls"),
      countDistinct(col(idCol)).as("ids")).collect()(0)
    val (n, nulls, ids) = (stats.getLong(0), stats.getLong(1),
      stats.getLong(2))
    require(nulls == 0L, s"$nulls rows have a null $idCol — no " +
      "deterministic shuffle position exists for them")
    // duplicate ids break determinism the same way nulls do: both
    // copies hash identically and tie on the id tiebreak, so the rank
    // orders them by physical partition order — a shard boundary
    // between them would place DIFFERENT payloads per run
    require(ids == n - nulls,
      s"${n - nulls - ids} duplicate $idCol value(s) — shard " +
        "determinism needs one row per id (dedupe or disambiguate " +
        "the id first)")
    if (n == 0L) return -1L
    require((n - 1) / rowsPerShard <= Int.MaxValue,
      s"${(n + rowsPerShard - 1) / rowsPerShard} shards exceed the " +
        "write plane's int partition id — raise rowsPerShard")
    val h = TF.hash60(concat(lit(s"shuf$epoch:"), col(idCol).cast("string")))
    val sharded = Shuffle
      .withShards(df.withColumn("__h", h), "__h", idCol, buckets, rowsPerShard)
      .withColumn("part", col("shard"))
      .withColumn("off", col("pos") - col("shard") * rowsPerShard)
      .drop("__h", "pos", "shard")
    CommitLog.writeLogged(sharded, outDir, topic,
      flushSize = rowsPerShard.toInt, pad = pad, format = format)
  }
}
