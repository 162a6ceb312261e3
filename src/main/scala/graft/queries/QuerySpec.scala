package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a DataFrame program over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names and row order must match between the two — the driver
  * sorts columns by name and hash-compares values.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the per-round Bench headline set */
    bench: Boolean = false)

object QuerySpec {
  /** The derived "Kafka stream at rest" view of the `events` table:
    * topic/partition/offset columns synthesized deterministically so
    * ingestion-operator demos (partitioning, rotation, filenames) have
    * the reference's envelope (FIXTURES.md §1.6). Mirrored in every
    * oracle as `event_id % 4` / `event_id`.
    */
  val StreamPartitions = 4
}
