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
  * see a complete export or none of it; re-exports append versions).
  *
  * The mapping onto the write plane's envelope is exact: shard →
  * `part`, rank-within-shard → `off`, so every existing consumer —
  * committed-file filters, max-offset recovery, compaction, snapshot
  * reads — applies to training shards unchanged. With `flushSize =
  * rowsPerShard` each shard is exactly ONE file named
  * `topic+shard+first+last.<fmt>`.
  */
object ShardExport {

  /** Shuffle `df` by the epoch-salted content hash of `idCol`, cut
    * into `rowsPerShard`-row shards, write one committed file per
    * shard under `outDir/topic`, and publish atomically. Returns the
    * published log version. Deterministic: same (input, epoch) ⇒ the
    * same shards byte-for-byte; a new epoch ⇒ a fresh permutation. */
  def exportShards(df: DataFrame, outDir: String, topic: String,
                   idCol: String, epoch: Long, buckets: Int,
                   rowsPerShard: Long,
                   format: String = "parquet",
                   pad: Int = FileNaming.DefaultZeroPadWidth): Long = {
    require(rowsPerShard > 0 && rowsPerShard <= Int.MaxValue,
      s"rowsPerShard must fit an int flush size, got $rowsPerShard")
    require(!df.columns.contains("part") && !df.columns.contains("off"),
      "input must not already carry the write plane's part/off envelope")
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
