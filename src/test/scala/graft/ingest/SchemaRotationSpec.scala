package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.schema.Compatibility

/** Golden file-split vectors from `avro/DataWriterAvroTest.java:268-353`
  * (flush.size=2, records with alternating schema versions):
  *  - BACKWARD: validOffsets {0,1,3,5,7} → files [0,0],[1,2],[3,4],[5,6]
  *  - NONE:     validOffsets {0..6}      → one file per record
  *  - FORWARD (first record v2 dropped): {1,2,4,6,8} → [1,1],[2,3],[4,5],[6,7]
  *  - missing version under BACKWARD → error
  * Batch-mode difference: the reference leaves a trailing partial file
  * uncommitted until more records arrive; a finite batch commits it
  * (affects only NONE's last record here, which aligns anyway). */
class SchemaRotationSpec extends SparkSuite {
  import spark.implicits._

  private def alternating(n: Int, startOffset: Long, startVer: Int) =
    (0 until n).map { i =>
      (12L, startOffset + i, if (i % 2 == 0) startVer else 3 - startVer, s"rec$i")
    }.toDF("part", "off", "ver", "payload")

  private def ranges(m: Seq[BatchWriter.CommittedFile]) =
    m.map(f => (f.startOffset, f.endOffset))

  test("BACKWARD reproduces validOffsets {0,1,3,5,7}") {
    val out = Files.createTempDirectory("schema-rot").toString
    val m = SchemaRotation.write(alternating(7, 0, 1), col("part"), col("off"),
      col("ver"), Compatibility.Backward, out, "t", flushSize = 2)
    assert(ranges(m) === Seq((0L, 0L), (1L, 2L), (3L, 4L), (5L, 6L)))
  }

  test("NONE rotates on every schema change: one record per file") {
    val out = Files.createTempDirectory("schema-rot").toString
    val m = SchemaRotation.write(alternating(7, 0, 1), col("part"), col("off"),
      col("ver"), Compatibility.None, out, "t", flushSize = 2)
    assert(ranges(m) === (0L to 6L).map(o => (o, o)))
  }

  test("FORWARD reproduces validOffsets {1,2,4,6,8}") {
    val out = Files.createTempDirectory("schema-rot").toString
    // reference drops the first record so the sequence starts with v2
    val m = SchemaRotation.write(alternating(7, 1, 2), col("part"), col("off"),
      col("ver"), Compatibility.Forward, out, "t", flushSize = 2)
    assert(ranges(m) === Seq((1L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)))
  }

  test("adopted version is running max under BACKWARD (projection target)") {
    val got = SchemaRotation.withSchemaFileIndex(alternating(4, 0, 1),
        col("part"), col("off"), col("ver"), Compatibility.Backward, 2)
      .select(col("off"), col("adopted_ver")).as[(Long, Int)].collect().toSeq.sorted
    assert(got === Seq((0L, 1), (1L, 2), (2L, 2), (3L, 2)))
  }

  test("NONE treats a null schema id as a distinct schema (rotates in and out)") {
    val out = Files.createTempDirectory("schema-rot").toString
    val df = Seq(
      (12L, 0L, Integer.valueOf(7), "a"),
      (12L, 1L, null.asInstanceOf[Integer], "b"),
      (12L, 2L, null.asInstanceOf[Integer], "c"),
      (12L, 3L, Integer.valueOf(7), "d")).toDF("part", "off", "ver", "payload")
    val m = SchemaRotation.write(df, col("part"), col("off"), col("ver"),
      Compatibility.None, out, "t", flushSize = 10)
    // segments: [7], [null,null], [7] — null neither merges into the
    // previous schema nor splits per-record
    assert(ranges(m) === Seq((0L, 0L), (1L, 2L), (3L, 3L)))
  }

  test("missing version under BACKWARD raises (reference parity)") {
    val out = Files.createTempDirectory("schema-rot").toString
    val bad = Seq((12L, 0L, null.asInstanceOf[Integer], "r"))
      .toDF("part", "off", "ver", "payload")
    val e = intercept[Exception] {
      SchemaRotation.write(bad, col("part"), col("off"), col("ver"),
        Compatibility.Backward, out, "t", flushSize = 2)
    }
    assert(e.getMessage != null)
  }
}
