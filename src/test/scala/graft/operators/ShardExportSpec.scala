package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ingest.CommitLog
import graft.tables.Tables

/** Pins the shard exporter's contract: totality (every curated row in
  * exactly one shard), shard sizing, offset-ranged one-file-per-shard
  * layout, determinism per epoch, and a fresh permutation per epoch. */
class ShardExportSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("export is total, shard-sized, logged, and epoch-deterministic") {
    val out = Files.createTempDirectory("graft-shards").toString
    val docs = Tables.documents(spark, d)
    val n = docs.count()
    val v = ShardExport.exportShards(docs, out, "train", "doc_id",
      epoch = 0L, buckets = 8, rowsPerShard = 16L)
    assert(v === 0L)
    // one committed file per shard, all rows present exactly once
    val files = CommitLog.snapshot(spark, out, "train")
    assert(files.size.toLong === (n + 15) / 16)
    val back = spark.read.parquet(s"$out/train")
    assert(back.count() === n)
    assert(back.select(col("doc_id")).distinct().count() === n)
    // shards are ≤ rowsPerShard and offsets are dense from 0
    // parquet encodes `part` as partition= directories — read back
    // under its discovery name
    val sizes = back.groupBy(col("partition").cast("long").as("part"))
      .agg(count(lit(1)).as("c"), min(col("off")).as("lo"),
        max(col("off")).as("hi"))
      .collect()
    sizes.foreach { r =>
      assert(r.getLong(1) <= 16L)
      assert(r.getLong(2) === 0L)
      assert(r.getLong(3) === r.getLong(1) - 1)
    }
    // full shards everywhere except possibly the last
    val full = sizes.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    full.dropRight(1).foreach { case (_, c) => assert(c === 16L) }

    // same epoch to a second topic: identical placement
    ShardExport.exportShards(docs, out, "train2", "doc_id",
      epoch = 0L, buckets = 8, rowsPerShard = 16L)
    val a = spark.read.parquet(s"$out/train")
      .selectExpr("cast(partition as long)", "off", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = spark.read.parquet(s"$out/train2")
      .selectExpr("cast(partition as long)", "off", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)

    // a new epoch: same totality, different permutation
    ShardExport.exportShards(docs, out, "train_e1", "doc_id",
      epoch = 1L, buckets = 8, rowsPerShard = 16L)
    val c = spark.read.parquet(s"$out/train_e1")
      .selectExpr("cast(partition as long)", "off", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(c.map(_._3) === a.map(_._3))
    assert(c !== a)
  }

  test("re-export into a committed topic is rejected — stale-bytes hazard") {
    val out = Files.createTempDirectory("graft-shards-re").toString
    val docs = Tables.documents(spark, d)
    ShardExport.exportShards(docs, out, "train", "doc_id",
      epoch = 0L, buckets = 8, rowsPerShard = 16L)
    val e = intercept[IllegalArgumentException] {
      ShardExport.exportShards(docs, out, "train", "doc_id",
        epoch = 1L, buckets = 8, rowsPerShard = 16L)
    }
    assert(e.getMessage.contains("fresh topic"))
  }

  test("null ids, reserved payload columns, and empty input fail fast / no-op") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-shards-guard").toString
    val withNull = Seq((Some(1L), "x"), (None, "y"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      ShardExport.exportShards(withNull, out, "t1", "doc_id", 0L, 4, 16L)
    }
    assert(e1.getMessage.contains("null doc_id"))
    val e2 = intercept[IllegalArgumentException] {
      ShardExport.exportShards(
        Seq((1L, "x")).toDF("doc_id", "partition"), out, "t2", "doc_id",
        0L, 4, 16L)
    }
    assert(e2.getMessage.contains("reserved"))
    // empty curated input: documented no-op, nothing published
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(ShardExport.exportShards(empty, out, "t3", "doc_id", 0L, 4, 16L) === -1L)
    assert(graft.ingest.CommitLog.latestVersion(spark, out, "t3") === -1L)
  }
}
