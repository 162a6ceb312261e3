package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.ingest.BatchWriter

/** C1–C4 round trip over a BatchWriter-committed topic directory:
  * create external partitioned table → sync partitions → query through
  * Spark SQL (the reference's Hive path, `HiveIntegrationAvroTest
  * .java:66-116`: table visible, partitions discovered, SELECT works
  * with partition pruning) → evolve schema with ADD COLUMNS. */
class TableCatalogSpec extends SparkSuite {
  import spark.implicits._

  test("external table create + partition sync + SQL query + evolution") {
    val out = Files.createTempDirectory("graft-catalog").toString
    val df = (for (p <- Seq(0L, 1L); o <- 0L until 4L)
      yield (p, o, s"v-$p-$o")).toDF("part", "off", "payload")
    BatchWriter.write(df, out, "events_cat", flushSize = 2)

    val table = "events_cat"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    TableCatalog.createExternalTable(spark, table, s"$out/events_cat",
      dataSchema = StructType(Seq(
        StructField("off", LongType), StructField("payload", StringType))),
      partitionCols = Seq("partition" -> "BIGINT"))

    // before sync: no partitions registered → empty scan
    assert(spark.sql(s"SELECT * FROM $table").count() === 0)

    TableCatalog.syncPartitions(spark, table)
    assert(spark.sql(s"SELECT count(*) FROM $table").as[Long].head() === 8)
    assert(spark.sql(s"SHOW PARTITIONS $table").count() === 2)

    // partition-pruned query returns partition column + data columns
    val pruned = spark.sql(s"SELECT partition, off FROM $table WHERE partition = 1")
    assert(pruned.count() === 4)

    // C3: explicit partition registration for a fresh directory
    val extra = Seq((7L, 0L, "x")).toDF("part", "off", "payload")
    BatchWriter.write(extra, out, "events_cat", flushSize = 2)
    TableCatalog.addPartition(spark, table, Map("partition" -> 7))
    assert(spark.sql(s"SELECT count(*) FROM $table").as[Long].head() === 9)

    // C2: BACKWARD evolution adds a nullable column
    val current = StructType(Seq(
      StructField("off", LongType), StructField("payload", StringType)))
    val evolved = current.add(StructField("quality", DoubleType))
    TableCatalog.addColumns(spark, table,
      TableCatalog.newColumnsOf(current, evolved))
    val cols = spark.table(table).schema.fieldNames.toSeq
    assert(cols.contains("quality"))
    // old files read as null for the new column
    assert(spark.sql(s"SELECT count(*) FROM $table WHERE quality IS NULL")
      .as[Long].head() === 9)

    spark.sql(s"DROP TABLE $table")
  }

  test("partition values with quotes are escaped, not injected") {
    val loc = Files.createTempDirectory("graft-cat-esc").toString
    spark.sql("DROP TABLE IF EXISTS esc_tab")
    TableCatalog.createExternalTable(spark, "esc_tab", loc,
      dataSchema = StructType(Seq(StructField("v", LongType))),
      partitionCols = Seq("event_type" -> "STRING"))
    TableCatalog.addPartition(spark, "esc_tab", Map("event_type" -> "user's-click"))
    val parts = spark.sql("SHOW PARTITIONS esc_tab").collect().map(_.getString(0))
    // Spark URL-encodes special chars in partition path names
    assert(parts.exists(p => p.contains("user's-click") || p.contains("user%27s-click")),
      parts.mkString(","))
    spark.sql("DROP TABLE esc_tab")
  }
}
