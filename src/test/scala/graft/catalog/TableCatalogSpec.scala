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

  test("avro external-table DDL pins the schema literal (AvroHiveUtil parity)") {
    // the reference registers Avro topics with an explicit
    // avro.schema.literal (AvroHiveUtil.java:56-97); the DDL must carry
    // the SAME record schema the sink writes with
    val dataSchema = StructType(Seq(
      StructField("off", LongType, nullable = false),
      StructField("payload", StringType)))
    val ddl = TableCatalog.avroTableDdl("events_avro", "/data/events_avro",
      dataSchema, Seq("partition" -> "BIGINT"), recordName = "events")
    assert(ddl.contains("USING AVRO"))
    assert(ddl.contains("PARTITIONED BY (`partition` BIGINT)"))
    assert(ddl.contains("LOCATION '/data/events_avro'"))
    // the embedded literal is exactly the sink's writer schema — as the
    // avroSchema OPTION (storage properties reach Spark's datasource at
    // scan time) and as Hive-compat avro.schema.literal metadata
    val expected = graft.ingest.AvroSink
      .avroSchemaFor(dataSchema, "events").toString
    assert(ddl.contains(s"OPTIONS ('avroSchema' = '$expected')"))
    assert(ddl.contains(s"'avro.schema.literal' = '$expected'"))
    // and it parses back to the same record shape
    val lit = ddl.split("'avro\\.schema\\.literal' = '")(1).stripSuffix("')")
    val parsed = new org.apache.avro.Schema.Parser().parse(lit)
    assert(parsed.getName === "events")
    assert(parsed.getFields.size === 2)
    assert(parsed.getField("payload").schema().getType ===
      org.apache.avro.Schema.Type.UNION) // nullable → union[null, string]
  }

  test("avro evolution swaps the schema literal (AvroHiveUtil.alterSchema parity)") {
    val current = StructType(Seq(
      StructField("off", LongType, nullable = false),
      StructField("payload", StringType)))
    val evolved = current.add(StructField("quality", DoubleType))
    val ddls = TableCatalog.alterAvroSchemaDdl("events_avro", current, evolved,
      recordName = "events")
    assert(ddls.size === 3)
    assert(ddls(0).contains("ADD COLUMNS") && ddls(0).contains("quality"))
    val expected = graft.ingest.AvroSink
      .avroSchemaFor(evolved, "events").toString
    assert(ddls(1).contains("SET SERDEPROPERTIES") &&
      ddls(1).contains(s"'avroSchema' = '$expected'"))
    assert(ddls(2).contains(s"'avro.schema.literal' = '$expected'"))
    // evolution with no new columns is only the literal swap
    assert(TableCatalog.alterAvroSchemaDdl("t", evolved, evolved).size === 2)

    // mechanism check on a stand-in table (avro can't CREATE in this
    // container): option.-prefixed SET TBLPROPERTIES must reach the
    // table's STORAGE properties — what the datasource consumes — not
    // just the inert table-properties bag
    spark.sql("DROP TABLE IF EXISTS avro_evolve_mech")
    val loc = Files.createTempDirectory("graft-cat-evolve").toString
    spark.sql("CREATE TABLE avro_evolve_mech (off BIGINT, payload STRING) " +
      s"USING PARQUET OPTIONS ('avroSchema' = 'stale') LOCATION '$loc'")
    TableCatalog.alterAvroSchema(spark, "avro_evolve_mech", current, evolved,
      recordName = "events")
    val storageRow = spark.sql("DESCRIBE TABLE EXTENDED avro_evolve_mech")
      .filter(col("col_name") === "Storage Properties")
      .collect().map(_.getString(1)).mkString
    assert(storageRow.contains("avroSchema") && storageRow.contains("quality"),
      s"evolved avroSchema option missing from storage properties: $storageRow")
    assert(!storageRow.contains("stale"), s"stale option survived: $storageRow")
    assert(spark.table("avro_evolve_mech").schema.fieldNames.contains("quality"))
    spark.sql("DROP TABLE avro_evolve_mech")
  }

  test("avro external table create fails fast here with the deploy pointer") {
    // this container has no spark-avro module, and Spark resolves the
    // USING provider eagerly at CREATE — the failure must be the
    // actionable "deploy spark-avro" analysis error, not something
    // deep in a later scan. (On a cluster with the module, the same
    // DDL registers the table with avro.schema.literal intact — the
    // string contract is pinned by the test above.)
    spark.sql("DROP TABLE IF EXISTS events_avro_cat")
    val loc = Files.createTempDirectory("graft-cat-avro").toString
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      TableCatalog.createAvroExternalTable(spark, "events_avro_cat", loc,
        StructType(Seq(StructField("off", LongType), StructField("payload", StringType))),
        Seq("partition" -> "BIGINT"), recordName = "events")
    }
    assert(e.getMessage.toLowerCase.contains("avro"))
  }

  test("tables register into a target database (hive.database analog); dotted names stay single identifiers") {
    val out = Files.createTempDirectory("graft-cat-db").toString
    val df = Seq((0L, 0L, "x")).toDF("part", "off", "payload")
    BatchWriter.write(df, out, "tdb", flushSize = 2)
    TableCatalog.createDatabase(spark, "graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.events_db")
    TableCatalog.createExternalTable(spark, "events_db", s"$out/tdb",
      dataSchema = StructType(Seq(
        StructField("off", LongType), StructField("payload", StringType))),
      partitionCols = Seq("partition" -> "BIGINT"),
      database = Some("graft_db"))
    TableCatalog.syncPartitions(spark, "events_db", database = Some("graft_db"))
    assert(spark.sql("SELECT count(*) FROM graft_db.events_db")
      .as[Long].head() === 1)
    // the table lives in the target namespace, not default
    assert(spark.sql("SHOW TABLES IN graft_db").collect()
      .map(_.getString(1)).contains("events_db"))
    spark.sql("DROP TABLE graft_db.events_db")
    spark.sql("DROP DATABASE graft_db")

    // a DOTTED table name (legal Kafka topic charset) stays ONE quoted
    // identifier — Spark's catalog then rejects it with its own
    // invalid-name error. The guarded regression: dot-splitting the
    // name would instead emit `events`.`v2` and either fail with a
    // misleading missing-database error or land the table in a foreign
    // namespace.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      TableCatalog.createExternalTable(spark, "events.v2", s"$out/tdb",
        dataSchema = StructType(Seq(
          StructField("off", LongType), StructField("payload", StringType))),
        partitionCols = Seq("partition" -> "BIGINT"))
    }
    assert(e.getMessage.contains("not a valid name"), e.getMessage)
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

  test("null partition values are rejected, not registered as 'null'") {
    // the quoted-literal fallback would render a null as the STRING
    // 'null' and silently register a partition literally named "null"
    val e = intercept[IllegalArgumentException] {
      TableCatalog.addPartition(spark, "any_tab",
        Map("event_type" -> (null: Any)))
    }
    assert(e.getMessage.contains("null partition value"))
  }
}
