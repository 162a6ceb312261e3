package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.BatchWriter
import graft.streaming.StreamIngest

/** Runnable demo of the streaming ingest pipeline over a file source:
  * events arrive as JSON files, the pipeline commits offset-ranged
  * parquet, a second run with a fresh checkpoint replays the source
  * (at-least-once) and commits nothing twice. Prints commit state. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // cached-batch stats pruning drops NaN rows (reproduced on this
      // Spark: a cached frame filtered on d >= x loses its NaN rows
      // because the batch upper bound is computed with JVM compares,
      // which ignore NaN) - correctness over a micro-optimization
      .config("spark.sql.inMemoryColumnarStorage.partitionPruning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val in = Files.createTempDirectory("demo-in").toString
    val out = Files.createTempDirectory("demo-out").toString
    val schema = StructType(Seq(
      StructField("part", LongType), StructField("off", LongType),
      StructField("payload", StringType)))

    def arrive(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("part", "off", "payload").coalesce(1)
        .write.mode("append").json(in)

    def run(checkpoint: String): Unit = {
      val stream = spark.readStream.schema(schema).json(in)
      val q = StreamIngest.start(stream, out, "t", flushSize = 2, checkpoint)
      q.processAllAvailable()
      q.stop()
    }

    arrive((0L to 4L).map(o => (0L, o, s"v$o")))
    run(Files.createTempDirectory("demo-ck1").toString)
    println("DEMO_AFTER_RUN1=" + BatchWriter.maxCommittedOffsets(spark, out, "t"))

    // more data arrives; a FRESH checkpoint forces full source replay —
    // the filename-recovery filter must keep the overlap out
    arrive(Seq((0L, 5L, "v5"), (1L, 0L, "w0")))
    run(Files.createTempDirectory("demo-ck2").toString)

    val back = BatchWriter.read(spark, out, "t")
    println("DEMO_AFTER_RUN2=" + BatchWriter.maxCommittedOffsets(spark, out, "t"))
    println("DEMO_TOTAL=" + back.count())
    println("DEMO_DISTINCT=" +
      back.select(countDistinct(col("part"), col("off"))).as[Long].head())
    println("DEMO_FILES=" + BatchWriter.listCommitted(spark, out, "t").mkString(","))

    // schema-adoption tracking over a versioned stream (A8 streaming)
    val in2 = Files.createTempDirectory("demo-ver-in").toString
    Seq((0L, 0L, 1), (0L, 1L, 2), (0L, 2L, 1), (1L, 0L, 4))
      .toDF("part", "off", "ver").coalesce(1).write.mode("append").json(in2)
    val verStream = spark.readStream.schema(StructType(Seq(
        StructField("part", LongType), StructField("off", LongType),
        StructField("ver", IntegerType)))).json(in2)
      .as[graft.streaming.SchemaTracker.SchemaEvent]
    implicit val s = spark
    val q2 = graft.streaming.SchemaTracker
      .adoptions(verStream, graft.schema.Compatibility.Backward)
      .writeStream.format("memory").queryName("demo_adoptions")
      .option("checkpointLocation", Files.createTempDirectory("demo-ck3").toString)
      .outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    println("DEMO_ADOPTIONS=" + spark.table("demo_adoptions")
      .orderBy("part", "off").collect().mkString(","))

    // avro sink over real events (snappy codec, avro-core writer)
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .select(pmod(col("event_id"), lit(4L)).as("part"),
        col("event_id").as("off"), col("event_type"), col("value"))
    val avroOut = Files.createTempDirectory("demo-avro").toString
    val m = graft.ingest.AvroSink.write(ev, avroOut, "events", 250, codec = "snappy")
    println("DEMO_AVRO_FILES=" + BatchWriter.listCommitted(spark, avroOut, "events").take(2))
    val (sch, rows) = graft.ingest.AvroSink.readFile(m.head.path.stripPrefix("file:"))
    println("DEMO_AVRO=" + sch.getName + " n=" + rows.size + " first=" + rows.head)
    spark.stop()
  }
}
