package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ingest.SchemaRotation
import graft.schema.Compatibility

/** The system-test workload generator mirrors `SchemaSourceTask`
  * record-for-record and drives the schema-rotation plane the way the
  * reference's evolution system tests do. */
class SchemaSourceSpec extends SparkSuite {

  import spark.implicits._

  private val cfg = SchemaSource.parse(Map(
    "name" -> "st", "id" -> "3", "topic" -> "t",
    "num.messages" -> "8", "multiple.schema" -> "true",
    "partition.count" -> "3"))

  test("mirrors the reference's values, alternation, and envelope") {
    val rows = SchemaSource.records(spark, cfg)
      .select("part", "off", "ver", "int", "double", "partitioning",
        "string", "id", "seqno")
      .as[(Long, Long, Int, Int, Double, Int, Option[String], Int, Long)]
      .collect().sortBy(_._2)
    assert(rows.length === 8)
    assert(rows.map(_._3).toSeq === Seq(1, 2, 1, 2, 1, 2, 1, 2))
    rows.foreach { case (part, off, ver, i, d, pv, s, id, seqno) =>
      assert(part === 3L && id === 3)
      assert(i === 12 && d === 12.2)
      assert(pv === (seqno % 3).toInt)
      assert(off === seqno)
      // v1's schema has no string field; v2 emits "def"
      assert(s === (if (ver == 2) Some("def") else None))
    }
  }

  test("resume restarts the alternation at v1 (count-based, the task's quirk)") {
    val resumed = SchemaSource.records(spark, cfg, fromSeqno = 5L)
      .select("seqno", "ver").as[(Long, Int)].collect().sortBy(_._1)
    assert(resumed.map(_._1).toSeq === (5L until 13L).toSeq)
    // count restarts at 0 on resume, so seqno 5 is v1 again
    assert(resumed.map(_._2).toSeq === Seq(1, 2, 1, 2, 1, 2, 1, 2))
  }

  test("drives schema rotation under BACKWARD like the reference system test") {
    val split = SchemaRotation.withSchemaFileIndex(
      SchemaSource.records(spark, cfg),
      col("part"), col("off"), col("ver"),
      Compatibility.Backward, flushSize = 3)
      .select("off", "adopted_ver", "seg_idx", "file_idx")
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    // v1@0 adopts 1; v2@1 adopts 2 and rotates; every later v1
    // projects UP into the adopted v2 segment — no further rotation,
    // files split on flush.size only: [0] | [1,2,3] [4,5,6] [7]
    assert(split.map(_._2).toSeq === Seq(1, 2, 2, 2, 2, 2, 2, 2))
    assert(split.map(_._3).distinct.length === 2)
    // group offsets by their (segment-encoding) file id: the adopted
    // segment restarts the flush counter, so files hold [0] | [1,2,3]
    // [4,5,6] [7]
    val files = split.groupBy(_._4).toSeq
      .map { case (_, rs) => rs.map(_._1).toSeq.sorted }
      .sortBy(_.head)
    assert(files === Seq(Seq(0L), Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L)))
  }
}
