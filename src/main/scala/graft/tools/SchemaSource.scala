package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's system-test workload generator, Spark-native —
  * `tools/SchemaSourceTask.java` emits deterministic records whose
  * schema alternates between version 1 and version 2 (v2 adds a
  * defaulted `string` field, `SchemaSourceTask.java:43-64`), used to
  * drive schema-evolution system tests end-to-end.
  *
  * The analog generates the SAME record stream as one DataFrame in the
  * wide (v2) shape plus a `ver` column: v1 records carry a null
  * `string` (the field is absent from their schema), v2 records carry
  * the emitted value `"def"` (`SchemaSourceTask.java:170`; the
  * DECLARED default is [[StringDefault]], what BACKWARD adoption
  * back-fills). Values mirror the task exactly: boolean=true, int=12,
  * long=12, float=12.2f, double=12.2, partitioning=seqno %
  * partition.count, id=task id (`SchemaSourceTask.java:140-160`), and
  * the stream envelope is (part=task id, off=seqno) — the task
  * publishes to kafka partition = task id.
  *
  * Quirk parity: the task alternates on COUNT SINCE TASK START, not
  * on seqno (`poll()` checks `count % 2`), so a task resumed from a
  * stored offset restarts the alternation at v1 — [[records]] with a
  * non-zero `fromSeqno` reproduces that. */
object SchemaSource {

  /** v2's declared default for the added field (what a BACKWARD
    * projection back-fills into v1 records). */
  val StringDefault = "abc"

  final case class Config(name: String, id: Int, topic: String,
                          numMessages: Long, multipleSchema: Boolean,
                          partitionCount: Int) {
    require(numMessages >= 0, "num.messages must be >= 0")
    require(partitionCount >= 1, "partition.count must be >= 1")
  }

  /** Parse the reference's property names (`SchemaSourceTask.java:33-39`;
    * `throughput` is accepted and ignored — pacing is the scheduler's
    * job here). */
  def parse(props: Map[String, String]): Config =
    try Config(
      name = props.getOrElse("name", "schema-source"),
      id = props.getOrElse("id", "0").toInt,
      topic = props.getOrElse("topic", "test"),
      numMessages = props("num.messages").toLong,
      multipleSchema = props.getOrElse("multiple.schema", "false").toBoolean,
      partitionCount = props.getOrElse("partition.count", "1").toInt)
    catch {
      case e: Exception =>
        throw new IllegalArgumentException(
          s"Invalid SchemaSourceTask configuration: ${e.getMessage}")
    }

  /** The task's record stream for seqnos [fromSeqno, fromSeqno +
    * num.messages), in emission order. Pure `spark.range` arithmetic —
    * no driver-side rows, generates any message count
    * distributively. */
  def records(spark: SparkSession, cfg: Config,
              fromSeqno: Long = 0L): DataFrame = {
    val counted = spark.range(fromSeqno, fromSeqno + cfg.numMessages)
      .select(col("id").as("seqno"),
        (col("id") - fromSeqno).as("count"))
    val ver =
      if (!cfg.multipleSchema) lit(1)
      else when(pmod(col("count"), lit(2L)) === 0, 1).otherwise(2)
    counted.select(
      lit(cfg.id.toLong).as("part"),
      col("seqno").as("off"),
      ver.as("ver"),
      lit(true).as("boolean"),
      lit(12).as("int"),
      lit(12L).as("long"),
      lit(12.2f).as("float"),
      lit(12.2).as("double"),
      pmod(col("seqno"), lit(cfg.partitionCount.toLong)).cast("int")
        .as("partitioning"),
      when(ver === 2, "def").as("string"),
      lit(cfg.id).as("id"),
      col("seqno"))
  }
}
