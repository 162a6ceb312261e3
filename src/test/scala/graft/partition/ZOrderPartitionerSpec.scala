package graft.partition

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.ingest.{BatchWriter, GraftConfig}

/** The shipped Z-order `partitioner.class`: Morton path encoding
  * against hand-computed codes, the written directory layout, and
  * config validation of its consumed keys. */
class ZOrderPartitionerSpec extends SparkSuite {

  import spark.implicits._

  // 2024-01-01 00:00:00 UTC — epoch hour 473352, % 1024 = 264
  private val t0 = new java.sql.Timestamp(1704067200000L)

  private def pathOf(cfg: GraftConfig, user: Long): String =
    Seq((3L, user, t0)).toDF("part", "user_id", "ts")
      .select(cfg.partitionPath(col("part"), col("ts"), col).as("p"))
      .as[String].head()

  test("encodes the hand-computed Morton prefix") {
    val cfg = GraftConfig(Map("flush.size" -> "3",
      "partitioner.class" -> "graft.partition.ZOrderPartitioner",
      "partition.field.name" -> "user_id"))
    // u = 5 (bits 0,2), h = 264 (bits 3,8):
    // z = 1 + 16 + (1<<7) + (1<<17) = 131217; 20-bit code >> 14 = 8
    assert(pathOf(cfg, 5L) === "zfile=8")
  }

  test("path.format reconfigures fold and prefix widths") {
    val cfg = GraftConfig(Map("flush.size" -> "3",
      "partitioner.class" -> "graft.partition.ZOrderPartitioner",
      "partition.field.name" -> "user_id",
      "path.format" -> "4,2"))
    // u = 5 % 16 = 5, h = 264 % 16 = 8: z = 17 + (1<<7) = 145; >> 6 = 2
    assert(pathOf(cfg, 5L) === "zfile=2")
  }

  test("shapes the written directory layout; offsets recover through it") {
    val df = Seq((0L, 0L, 5L, t0, "a"), (0L, 1L, 900L, t0, "b"))
      .toDF("part", "off", "user_id", "timestamp", "payload")
    val out = Files.createTempDirectory("cfg-zorder").toString
    GraftConfig(Map("flush.size" -> "10",
      "partitioner.class" -> "graft.partition.ZOrderPartitioner",
      "partition.field.name" -> "user_id")).write(df, out, "t")
    // u=900 (bits 2,7,8,9), h=264 (bits 3,8):
    // z = 2^4+2^14+2^16+2^18 + 2^7+2^17 = 475280; >> 14 = 29
    val dirs = new java.io.File(s"$out/topics/t").listFiles().map(_.getName).toSet
    assert(dirs === Set("zfile=8", "zfile=29"))
    assert(BatchWriter.maxCommittedOffsets(spark, s"$out/topics", "t") ===
      Map(0L -> 1L))
  }

  test("drives the streaming commit loop's layout, exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ingest.CommitLog
    import graft.streaming.StreamIngest
    val out = Files.createTempDirectory("stream-zorder").toString
    val ckpt = Files.createTempDirectory("stream-zorder-ckpt").toString
    val cfg = GraftConfig(Map("flush.size" -> "10",
      "partitioner.class" -> "graft.partition.ZOrderPartitioner",
      "partition.field.name" -> "user_id"))
    val s1 = MemoryStream[(Long, Long, Long, java.sql.Timestamp, String)]
    val q1 = StreamIngest.startLogged(
      s1.toDF().toDF("part", "off", "user_id", "timestamp", "payload"),
      out, "t", cfg, ckpt)
    s1.addData((0L, 0L, 5L, t0, "a"), (0L, 1L, 900L, t0, "b"),
      (0L, 2L, 5L, t0, "c"))
    q1.processAllAvailable()
    q1.stop()
    val root = cfg.topicsRoot(out)
    val dirs = new java.io.File(s"$root/t").listFiles()
      .map(_.getName).filterNot(_.startsWith("_")).toSet
    assert(dirs === Set("zfile=8", "zfile=29"))
    assert(CommitLog.maxOffsets(spark, root, "t") === Map(0L -> 2L))

    // restart with a full replay + one new record: the Z layout holds
    // exactly-once like the built-in encoders
    val ckpt2 = Files.createTempDirectory("stream-zorder-ckpt2").toString
    val s2 = MemoryStream[(Long, Long, Long, java.sql.Timestamp, String)]
    val q2 = StreamIngest.startLogged(
      s2.toDF().toDF("part", "off", "user_id", "timestamp", "payload"),
      out, "t", cfg, ckpt2)
    s2.addData((0L, 0L, 5L, t0, "a"), (0L, 1L, 900L, t0, "b"),
      (0L, 2L, 5L, t0, "c"), (0L, 3L, 7L, t0, "d"))
    q2.processAllAvailable()
    q2.stop()
    val back = spark.read.parquet(s"$root/t")
    assert(back.count() === 4)
    assert(CommitLog.maxOffsets(spark, root, "t") === Map(0L -> 3L))
  }

  test("missing partition.field.name and malformed path.format fail validation") {
    val missing = intercept[IllegalArgumentException] {
      GraftConfig(Map("flush.size" -> "3",
        "partitioner.class" -> "graft.partition.ZOrderPartitioner"))
    }
    assert(missing.getMessage.contains("partition.field.name is required"))

    val bad = intercept[IllegalArgumentException] {
      GraftConfig(Map("flush.size" -> "3",
        "partitioner.class" -> "graft.partition.ZOrderPartitioner",
        "partition.field.name" -> "user_id",
        "path.format" -> "banana"))
    }
    assert(bad.getMessage.contains("'<bits>,<fileBits>'"))
  }
}
