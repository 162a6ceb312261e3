package graft.ingest

import org.apache.spark.sql.SparkSession

/** Session-level correctness guards the library enforces for its OWN
  * code paths, so a consumer-constructed `SparkSession` is safe
  * without knowing this engine's Spark-version folklore.
  */
object SessionSafety {

  val CachedPruningKey = "spark.sql.inMemoryColumnarStorage.partitionPruning"

  /** Disable Spark's cached-batch stats pruning for this session.
    *
    * Reproduced on this Spark (see the r13 fix `056d681` and
    * `FileStatsSpec`): a cached frame filtered on `d >= x` LOSES its
    * NaN rows, because InMemoryTableScan's per-batch upper bound is
    * computed with JVM comparisons that ignore NaN while the row-level
    * filter keeps NaN above every double (Spark's total order). Any
    * pipeline that persists a scored frame and thresholds it is
    * exposed — exactly the persist-then-filter shape of this engine's
    * write/dedup planes — so every such entry point calls this guard
    * instead of relying on the session builder having set the conf.
    * Idempotent, runtime-settable, and scoped to the calling session.
    */
  def disableNaNDroppingCachePruning(spark: SparkSession): Unit =
    spark.conf.set(CachedPruningKey, "false")
}
