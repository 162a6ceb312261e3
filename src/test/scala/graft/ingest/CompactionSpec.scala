package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Small-files compaction: merge contiguous committed files while
  * preserving the offset-ranged naming, the commit protocol, and every
  * record exactly once. */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def ingest(out: String, n: Long, flush: Int): Unit = {
    val df = (0L until n).map(o => (o % 2, o, s"v$o")).toDF("part", "off", "payload")
    BatchWriter.write(df, out, "t", flush)
  }

  test("contiguous small files merge to >= target records, tail stays") {
    val out = Files.createTempDirectory("compact").toString
    // 10 records, 2 partitions -> 5 records each; flush=1 -> 5 files per
    // partition of 1 record each
    ingest(out, 10, 1)
    assert(BatchWriter.listCommitted(spark, out, "t").size === 10)

    val manifest = BatchWriter.compact(spark, out, "t", targetRecords = 2)
    // offsets per partition are 0,2,4,6,8 (even) / 1,3,5,7,9 (odd):
    // ranges span 2 source offsets -> each pair of files merges
    assert(manifest.nonEmpty)
    val names = BatchWriter.listCommitted(spark, out, "t")
    assert(names === Seq(
      "t+0+0000000000+0000000002.parquet",
      "t+0+0000000004+0000000006.parquet",
      "t+0+0000000008+0000000008.parquet",
      "t+1+0000000001+0000000003.parquet",
      "t+1+0000000005+0000000007.parquet",
      "t+1+0000000009+0000000009.parquet"))

    val back = BatchWriter.read(spark, out, "t")
    assert(back.count() === 10)
    assert(back.select(countDistinct(col("part"), col("off"))).as[Long].head() === 10)
    assert(BatchWriter.maxCommittedOffsets(spark, out, "t") === Map(0L -> 8L, 1L -> 9L))
  }

  test("compaction is idempotent: a second run with the same target is a no-op") {
    val out = Files.createTempDirectory("compact-idem").toString
    ingest(out, 8, 1)
    BatchWriter.compact(spark, out, "t", targetRecords = 4)
    val after1 = BatchWriter.listCommitted(spark, out, "t")
    val m2 = BatchWriter.compact(spark, out, "t", targetRecords = 4)
    assert(m2.isEmpty) // nothing left to merge at this target
    assert(BatchWriter.listCommitted(spark, out, "t") === after1)
    assert(BatchWriter.read(spark, out, "t").count() === 8)
  }

  test("a crash in the commit->delete window heals on re-run: no dupes, no loss") {
    // Build the post-crash state directly: the compacted replacement
    // committed, but its sources were never deleted.
    val a = Files.createTempDirectory("compact-crash-a").toString
    ingest(a, 10, 1)
    BatchWriter.compact(spark, a, "t", targetRecords = 2) // produces t+0+0+2 etc.
    val b = Files.createTempDirectory("compact-crash-b").toString
    ingest(b, 10, 1) // sources all present
    val leftover = "t+0+0000000000+0000000002.parquet"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$a/t/partition=0/$leftover"),
      java.nio.file.Paths.get(s"$b/t/partition=0/$leftover"))

    // re-run: the subsumed sources (0-0, 2-2) must be healed away, the
    // survivor set regrouped with no record duplicated or lost
    BatchWriter.compact(spark, b, "t", targetRecords = 2)
    val back = BatchWriter.read(spark, b, "t")
    assert(back.count() === 10)
    assert(back.select(countDistinct(col("part"), col("off"))).as[Long].head() === 10)
    assert(BatchWriter.listCommitted(spark, b, "t") === Seq(
      "t+0+0000000000+0000000002.parquet",
      "t+0+0000000004+0000000006.parquet",
      "t+0+0000000008+0000000008.parquet",
      "t+1+0000000001+0000000003.parquet",
      "t+1+0000000005+0000000007.parquet",
      "t+1+0000000009+0000000009.parquet"))
  }

  test("json files compact end-to-end like parquet") {
    val out = Files.createTempDirectory("compact-json").toString
    val df = (0L until 6L).map(o => (0L, o, s"v$o")).toDF("part", "off", "payload")
    BatchWriter.write(df, out, "t", flushSize = 1, format = "json")
    assert(BatchWriter.listCommitted(spark, out, "t").size === 6)
    BatchWriter.compact(spark, out, "t", targetRecords = 3, format = "json")
    assert(BatchWriter.listCommitted(spark, out, "t") === Seq(
      "t+0+0000000000+0000000002.json", "t+0+0000000003+0000000005.json"))
    val back = BatchWriter.read(spark, out, "t", format = "json")
    assert(back.count() === 6)
    assert(back.select(countDistinct(col("off"))).as[Long].head() === 6)
  }

  test("orc files compact end-to-end like parquet") {
    val out = Files.createTempDirectory("compact-orc").toString
    val df = (0L until 6L).map(o => (0L, o, s"v$o")).toDF("part", "off", "payload")
    BatchWriter.write(df, out, "t", flushSize = 1, format = "orc")
    assert(BatchWriter.listCommitted(spark, out, "t").size === 6)
    BatchWriter.compact(spark, out, "t", targetRecords = 3, format = "orc")
    assert(BatchWriter.listCommitted(spark, out, "t") === Seq(
      "t+0+0000000000+0000000002.orc", "t+0+0000000003+0000000005.orc"))
    val back = BatchWriter.read(spark, out, "t", format = "orc")
    assert(back.count() === 6)
    assert(back.select(countDistinct(col("off"))).as[Long].head() === 6)
  }

  test("compact rejects formats that cannot be read back with their schema") {
    val out = Files.createTempDirectory("compact-fmt").toString
    intercept[IllegalArgumentException] {
      BatchWriter.compact(spark, out, "t", 2, format = "csv")
    }
    intercept[IllegalArgumentException] {
      BatchWriter.compact(spark, out, "t", 2, format = "text")
    }
  }

  test("files already at target size are untouched (no rewrite, no delete)") {
    val out = Files.createTempDirectory("compact-single").toString
    val df = (0L until 4L).map(o => (0L, o, s"v$o")).toDF("part", "off", "payload")
    BatchWriter.write(df, out, "t", flushSize = 2) // two 2-record files
    val before = BatchWriter.listCommitted(spark, out, "t")
    assert(BatchWriter.compact(spark, out, "t", targetRecords = 2) === Seq.empty)
    assert(BatchWriter.listCommitted(spark, out, "t") === before)
  }
}
