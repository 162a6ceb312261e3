package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Vectors from the reference:
  * `TopicPartitionWriterTest.java:110-150` (pad-2 names `topic+12+00+02`),
  * `FileUtilsTest.java:9-17` (offset extraction = regex group 4),
  * `filter/CommittedFileFilterTest.java:54-185` (accept/reject sets). */
class FileNamingSpec extends SparkSuite {
  import spark.implicits._

  test("encodeName matches reference layout with default zero-pad 10") {
    assert(FileNaming.encodeName("topic", 12, 0, 2, ".avro") ===
      "topic+12+0000000000+0000000002.avro")
  }

  test("encodeName honors configured pad width (pad=2 vector)") {
    assert(FileNaming.encodeName("topic", 12, 0, 2, ".avro", pad = 2) ===
      "topic+12+00+02.avro")
    assert(FileNaming.encodeName("topic", 12, 3, 5, ".avro", pad = 2) ===
      "topic+12+03+05.avro")
  }

  test("column encode equals driver-side encodeName") {
    val row = Seq(("events", 3, 100L, 199L)).toDF("t", "p", "s", "e")
      .select(FileNaming.encode(col("t"), col("p"), col("s"), col("e"), ".parquet"))
      .as[String].head()
    assert(row === FileNaming.encodeName("events", 3, 100L, 199L, ".parquet"))
  }

  test("extractEndOffset pulls regex group 4 as long") {
    val names = Seq(
      "topic+0+0+199.avro",               // unpadded
      "ns.topic-x+12+0000000100+0000000200.parquet", // dots/dashes in topic
      "not_a_committed_file.parquet")
    val got = names.toDF("name")
      .select(FileNaming.extractEndOffset(col("name"))).as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(199L), Some(200L), None))
  }

  test("extractTopic / extractPartition decode their groups") {
    val df = Seq("ns.topic-x+12+100+200.parquet").toDF("name")
    val (t, p) = df.select(
      FileNaming.extractTopic(col("name")),
      FileNaming.extractPartition(col("name"))).as[(String, Int)].head()
    assert(t === "ns.topic-x" && p === 12)
  }

  test("isCommitted accepts committed names, rejects temp/garbage") {
    val cases = Seq(
      "topic+12+0000000000+0000000002.avro" -> true,
      "topic+0+0+0" -> true,                       // extension optional
      "a0b1c2d3_tmp.parquet" -> false,             // temp file
      "topic+12+00+bad.avro" -> false,             // non-numeric offset
      "_spark_metadata" -> false,
      "topic+12+00.avro" -> false)                 // missing group
    val got = cases.map(_._1).toDF("name")
      .select(col("name"), FileNaming.isCommitted(col("name")))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (n, want) => assert(got(n) === want, n) }
  }

  test("isCommittedForTopic narrows by topic like TopicCommittedFileFilter") {
    val df = Seq("a+1+0+1.avro", "b+1+0+1.avro").toDF("name")
    val got = df.filter(FileNaming.isCommittedForTopic(col("name"), "a"))
      .as[String].collect()
    assert(got.toSeq === Seq("a+1+0+1.avro"))
  }
}
