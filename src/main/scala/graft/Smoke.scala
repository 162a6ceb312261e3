package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke gate: `SparkEntry.entry` must return
  * >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // cached-batch stats pruning drops NaN rows (reproduced on this
      // Spark: a cached frame filtered on d >= x loses its NaN rows
      // because the batch upper bound is computed with JVM compares,
      // which ignore NaN) - correctness over a micro-optimization
      .config("spark.sql.inMemoryColumnarStorage.partitionPruning", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(10, truncate = false)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
