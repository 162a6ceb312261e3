package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (UTC, small shuffle). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.session
  override def afterAll(): Unit = () // session shared across suites
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
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
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
