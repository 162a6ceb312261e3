package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source adapter (A1): the reference's `SinkRecord` envelope
  * (`HdfsSinkTask.java:107-113`) maps 1:1 onto Spark's Kafka source
  * columns. Backpressure, offset seek, and rebalancing are source
  * options / engine-internal (`TopicPartitionWriter.java:539-545,611-634`
  * → `maxOffsetsPerTrigger`, checkpoint, Spark scheduler).
  *
  * NOTE: the spark-sql-kafka connector jar is not in this container,
  * so [[fromTopic]] fails at stream resolution here; [[normalize]]
  * (the engine-side contract) is exercised against synthetic frames of
  * the same shape, and `StreamIngest` consumes any stream-shaped frame
  * — file source and MemoryStream in tests, Kafka in production.
  */
object KafkaSource {

  /** `readStream` from a topic; pair with [[normalize]] then
    * `StreamIngest.start`. */
  def fromTopic(spark: SparkSession, bootstrapServers: String, topic: String,
                maxOffsetsPerTrigger: Long = 1000000L): DataFrame =
    fromTopics(spark, bootstrapServers, Seq(topic), maxOffsetsPerTrigger)

  /** `readStream` subscribed to MANY topics in one consumer — the
    * reference connector's `topics` list config. [[normalize]] keeps
    * the `topic` column, so the stream feeds
    * `StreamIngest.startLoggedMulti`'s per-topic demux directly:
    * one query, N topics, per-topic commit logs. */
  def fromTopics(spark: SparkSession, bootstrapServers: String,
                 topics: Seq[String],
                 maxOffsetsPerTrigger: Long = 1000000L): DataFrame = {
    require(topics.nonEmpty, "at least one topic")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest") // checkpoint overrides after first run
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
  }

  /** Kafka envelope → the engine's stream shape
    * (topic, part, off, ts, key, value). */
  def normalize(kafka: DataFrame): DataFrame =
    kafka.select(
      col("topic"),
      col("partition").cast("long").as("part"),
      col("offset").as("off"),
      col("timestamp").as("ts"),
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"))
}
