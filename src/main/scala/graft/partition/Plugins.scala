package graft.partition

import org.apache.spark.sql.Column

/** User-supplied partitioner SPI — the engine's analog of the
  * reference's pluggable `partitioner.class` (loaded by reflection in
  * `/root/reference/src/main/java/io/confluent/connect/hdfs/DataWriter.java:537-558`,
  * extension contract documented in `docs/hdfs_connector.rst:205-208`).
  *
  * Where the reference's `Partitioner.encodePartition` computes a path
  * string per record on the hot path, the Spark-native plug-in
  * CONSTRUCTS the path `Column` once at plan time: the returned
  * expression is codegen'd, foldable where its inputs are, and prunable
  * by Catalyst — a custom layout costs the same as a built-in one.
  * Implementations need a public no-arg constructor; [[configure]]
  * receives the full validated property map (the Connect
  * `Partitioner.configure(config)` step).
  */
/** Common configure step for reflectively-loaded plug-ins (the
  * Connect `Configurable` contract): called once, after construction,
  * with the full validated property map. */
trait Pluggable {
  def configure(props: Map[String, String]): Unit = ()
}

trait PluggablePartitioner extends Pluggable {

  /** The directory-path expression for one record: `kafkaPartition` is
    * the source partition column, `ts` the configured record time, and
    * `field` resolves any payload column by name. */
  def encode(kafkaPartition: Column, ts: Column,
             field: String => Column): Column
}

/** User-supplied record-time SPI — the analog of a custom
  * `timestamp.extractor` class (`TopicPartitionWriter.java:174-185`).
  * Returns the record-time `Column` the time-partitioner family and
  * interval rotation consume. */
trait PluggableTimestampExtractor extends Pluggable {

  /** The record-time expression; `field` resolves payload columns by
    * name (the stream envelope's Kafka timestamp is `field("ts")`). */
  def recordTime(field: String => Column): Column
}

/** Reflection loader with the failure modes spelled out — the
  * reference's `Class.forName` + `newInstance` chain
  * (`DataWriter.java:537-558`) with each way it can go wrong reported
  * as a config-validation error instead of a stack trace mid-write. */
object Plugins {
  def load[T](fqcn: String, iface: Class[T]): Either[String, T] =
    try {
      val cls = Class.forName(fqcn)
      if (!iface.isAssignableFrom(cls))
        Left(s"class '$fqcn' does not implement ${iface.getName}")
      else Right(cls.getDeclaredConstructor().newInstance().asInstanceOf[T])
    } catch {
      case _: ClassNotFoundException =>
        Left(s"class '$fqcn' not found on the classpath")
      case _: NoSuchMethodException =>
        Left(s"class '$fqcn' has no public no-arg constructor")
      case e: ReflectiveOperationException =>
        Left(s"class '$fqcn' could not be instantiated: ${e.getMessage}")
    }
}
