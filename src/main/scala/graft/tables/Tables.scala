package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test-data star schema (TESTDATA.md).
  *
  * Mirrors the reference's notion of "topics at rest as files"
  * (`/root/reference/src/main/java/io/confluent/connect/hdfs/FileUtils.java:41-64`):
  * every logical table is a directory of immutable parquet files that
  * Spark scans with full predicate-pushdown / column-pruning support.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped under two parquet encodings across
    * test-data generations: TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so it is read as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncated to
    * microseconds — and TIMESTAMP(MICROS), which decodes natively as
    * TIMESTAMP_NTZ. Both normalize to the same session-TZ-anchored
    * micro-precision TimestampType column (every engine entry point
    * runs UTC, so the NTZ→LTZ cast is value-identical), keeping the
    * loaded schema one thing downstream of here regardless of which
    * generation is on disk.
    *
    * The conf is SCOPED to this read (set, infer, restore): the
    * relation captures it at schema-inference time, so later actions
    * on the returned frame are unaffected by the restore — and other
    * parquet reads in the session keep their configured semantics
    * instead of silently decoding any TIMESTAMP(NANOS) column as long
    * because `events` happened to load first. (Verified on this Spark
    * by aggregating the ts column AFTER both unsetting and
    * false-setting the conf — the scan honors the inferred long
    * schema, not the action-time conf.) */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val raw = spark.read.parquet(s"$dir/events.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampType => raw
          case _ => // TIMESTAMP_NTZ: anchor to the (UTC) session zone
            raw.withColumn(
              "ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        }
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    case n =>
      spark.read.parquet(s"$dir/$n.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
