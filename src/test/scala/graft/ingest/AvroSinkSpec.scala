package graft.ingest

import java.nio.file.Files

import graft.SparkSuite

/** B1/B5 golden tests mirroring the reference's Avro writer suite:
  * file layout (`DataWriterAvroTest.java:63-77`), value round-trip
  * (`TestWithMiniDFSCluster.java:266-307`), codec configuration
  * (`DataWriterAvroTest.java:406-440`). */
class AvroSinkSpec extends SparkSuite {
  import spark.implicits._

  private def records(n: Long) =
    (0L until n).map(o => (12L, o, s"v$o", o * 1.5)).toDF("part", "off", "s", "d")

  test("golden .avro layout with flush splits, values round-trip") {
    val out = Files.createTempDirectory("avro-sink").toString
    val m = AvroSink.write(records(7), out, "topic", flushSize = 3)
    assert(BatchWriter.listCommitted(spark, out, "topic") === Seq(
      "topic+12+0000000000+0000000002.avro",
      "topic+12+0000000003+0000000005.avro",
      "topic+12+0000000006+0000000006.avro"))
    val (schema, rows) = AvroSink.readFile(m.head.path.stripPrefix("file:"))
    assert(schema.getName === "topic")
    assert(schema.getFields.size === 4)
    assert(rows.map(r => (r("off"), r("s"), r("d"))) ===
      Seq((0L, "v0", 0.0), (1L, "v1", 1.5), (2L, "v2", 3.0)))
  }

  test("deflate and snappy codecs write readable files") {
    for (codec <- Seq("deflate", "snappy")) {
      val out = Files.createTempDirectory(s"avro-$codec").toString
      val m = AvroSink.write(records(4), out, "t", flushSize = 4, codec = codec)
      val (_, rows) = AvroSink.readFile(m.head.path.stripPrefix("file:"))
      assert(rows.size === 4, codec)
    }
  }

  test("unknown codec and unsupported column types fail fast") {
    val out = Files.createTempDirectory("avro-bad").toString
    intercept[IllegalArgumentException] {
      AvroSink.write(records(2), out, "t", 2, codec = "zstd-nope")
    }
    val arr = Seq((0L, 0L, Seq(1, 2))).toDF("part", "off", "a")
    intercept[IllegalArgumentException] {
      AvroSink.write(arr, out, "t", 2)
    }
  }
}
