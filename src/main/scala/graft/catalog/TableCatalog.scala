package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog plane (SURVEY §2.C): the reference registers every topic as
  * a Hive external partitioned table and keeps schema + partitions in
  * sync (`avro/AvroHiveUtil.java:56-97`, `parquet/ParquetHiveUtil.java:43-84`,
  * bootstrap `DataWriter.java:383-420`). Spark's session catalog gives
  * the same DDL surface natively; queries then run through Spark SQL —
  * the engine that replaces the reference's Hive delegation
  * (`hive/HiveExec.java:59-71`).
  */
object TableCatalog {

  /** One identifier part, backtick-quoted. Deliberately NOT dot-split:
    * legal Kafka topic names contain dots (`events.v2`), so a table
    * named after one must stay a single identifier — database
    * targeting is explicit via [[qualified]], never inferred from
    * dots. */
  private def q(ident: String): String = s"`${ident.replace("`", "``")}`"

  /** `db`.`table` when a database is given, bare `table` otherwise —
    * how every entry point consumes its `database` parameter (the
    * reference's `hive.database` key, `HiveConfig`). */
  private def qualified(database: Option[String], table: String): String =
    database.map(d => s"${q(d)}.${q(table)}").getOrElse(q(table))

  /** The `hive.database` analog: create the namespace tables target
    * (`CREATE DATABASE IF NOT EXISTS`). */
  def createDatabase(spark: SparkSession, database: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${q(database)}")
    ()
  }

  /** Single-quoted SQL string literal with quote escaping — partition
    * VALUES and locations are data, not identifiers. */
  private def lit(v: String): String = s"'${v.replace("'", "''")}'"

  /** C1 — create an external partitioned table over a committed topic
    * directory. Data columns from `schema`, partition columns listed
    * separately (the partitioner's fields). */
  def createExternalTable(spark: SparkSession, table: String, location: String,
                          dataSchema: StructType, partitionCols: Seq[(String, String)],
                          database: Option[String] = None): Unit = {
    val dataDdl = dataSchema.toDDL
    // omit the clause entirely for a non-partitioned table:
    // `PARTITIONED BY ()` is a ParseException, not a no-op
    val partClause =
      if (partitionCols.isEmpty) ""
      else partitionCols.map { case (n, t) => s"${q(n)} $t" }
        .mkString("\nPARTITIONED BY (", ", ", ")")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${qualified(database, table)} ($dataDdl)
         |USING PARQUET$partClause
         |LOCATION ${lit(location)}""".stripMargin)
  }

  /** C1 (Avro flavor) — the registration the reference's
    * `AvroHiveUtil` issues per Avro topic (`avro/AvroHiveUtil.java:56-97`),
    * re-expressed for Spark's catalog: the record schema is pinned as
    * the `avroSchema` OPTION — storage properties are what actually
    * reach Spark's avro datasource at scan time, so the reader schema
    * really is the registered one even as newer files carry evolved
    * writer schemas (Avro schema resolution). The reference's
    * `avro.schema.literal` TBLPROPERTIES key is kept alongside as
    * Hive-compat metadata (it is what a Hive reader of the same
    * metastore consumes; Spark itself ignores it on a datasource
    * table). Both carry the SAME record schema the sink writes with
    * ([[graft.ingest.AvroSink.avroSchemaFor]]) — catalog and data
    * plane can't drift. */
  def avroTableDdl(table: String, location: String, dataSchema: StructType,
                   partitionCols: Seq[(String, String)],
                   recordName: String = "record",
                   database: Option[String] = None): String = {
    val avroJson =
      graft.ingest.AvroSink.avroSchemaFor(dataSchema, recordName).toString
    // same empty-list rule as createExternalTable: `PARTITIONED BY ()`
    // is a ParseException, not a no-op
    val partClause =
      if (partitionCols.isEmpty) ""
      else partitionCols.map { case (n, t) => s"${q(n)} $t" }
        .mkString("\nPARTITIONED BY (", ", ", ")")
    s"""CREATE TABLE IF NOT EXISTS ${qualified(database, table)} (${dataSchema.toDDL})
       |USING AVRO
       |OPTIONS ('avroSchema' = ${lit(avroJson)})$partClause
       |LOCATION ${lit(location)}
       |TBLPROPERTIES ('avro.schema.literal' = ${lit(avroJson)})""".stripMargin
  }

  /** C2 (Avro flavor) — the literal-replacement evolution the
    * reference performs on schema change
    * (`avro/AvroHiveUtil.java:63-71`: `alterSchema` swaps
    * `avro.schema.literal` for the evolved schema's literal), as the
    * DDL statements Spark needs for the same effect:
    *
    *  1. `ADD COLUMNS` for the newly-added fields — on a Spark
    *     datasource table the DECLARED columns drive the read schema,
    *     so this is the part that actually widens scans;
    *  2. `SET SERDEPROPERTIES` replacing the functional `avroSchema`
    *     storage option — serde properties land in the table's STORAGE
    *     properties, which are what Spark hands the datasource at scan
    *     time (`SET TBLPROPERTIES` would only touch the inert
    *     table-properties bag);
    *  3. `SET TBLPROPERTIES` refreshing the Hive-compat
    *     `avro.schema.literal` metadata — the reference's exact key.
    *
    * The evolved literal is regenerated from the sink's own
    * StructType→Avro mapping, same as creation. */
  def alterAvroSchemaDdl(table: String, current: StructType,
                         evolved: StructType,
                         recordName: String = "record",
                         database: Option[String] = None): Seq[String] = {
    val avroJson =
      graft.ingest.AvroSink.avroSchemaFor(evolved, recordName).toString
    val added = newColumnsOf(current, evolved)
    val t = qualified(database, table)
    val addDdl =
      if (added.isEmpty) Seq.empty
      else Seq(s"ALTER TABLE $t ADD COLUMNS (${added.toDDL})")
    addDdl ++ Seq(
      s"ALTER TABLE $t SET SERDEPROPERTIES " +
        s"('avroSchema' = ${lit(avroJson)})",
      s"ALTER TABLE $t SET TBLPROPERTIES " +
        s"('avro.schema.literal' = ${lit(avroJson)})")
  }

  /** Execute [[alterAvroSchemaDdl]] against the session catalog. */
  def alterAvroSchema(spark: SparkSession, table: String,
                      current: StructType, evolved: StructType,
                      recordName: String = "record",
                      database: Option[String] = None): Unit =
    alterAvroSchemaDdl(table, current, evolved, recordName, database)
      .foreach(spark.sql(_))

  /** Execute [[avroTableDdl]]. Needs the spark-avro module on the
    * cluster classpath at scan time (the DDL itself is plain Spark
    * SQL). */
  def createAvroExternalTable(spark: SparkSession, table: String, location: String,
                              dataSchema: StructType,
                              partitionCols: Seq[(String, String)],
                              recordName: String = "record",
                              database: Option[String] = None): Unit = {
    spark.sql(avroTableDdl(table, location, dataSchema, partitionCols,
      recordName, database))
    ()
  }

  /** C4 — bootstrap sync: discover on-disk partitions into the
    * metastore (the reference's leaf-dir diff, `DataWriter.java:400-414`;
    * Hive's MSCK REPAIR). */
  def syncPartitions(spark: SparkSession, table: String,
                     database: Option[String] = None): Unit =
    spark.sql(s"MSCK REPAIR TABLE ${qualified(database, table)}")

  /** C3 — register one encoded partition explicitly (the first-write
    * hook, `TopicPartitionWriter.java:787-800`). */
  def addPartition(spark: SparkSession, table: String,
                   partitionSpec: Map[String, Any],
                   database: Option[String] = None): Unit = {
    // a null value would render as the quoted string 'null' and
    // silently register a partition literally named "null"
    partitionSpec.foreach { case (k, v) =>
      require(v != null, s"null partition value for column '$k'")
    }
    val spec = partitionSpec.map {
      // only bare integers render unquoted; everything else —
      // strings, dates, timestamps — goes through the quoted-literal
      // path (an unquoted 2026-08-16 is arithmetic to the parser)
      case (k, v: Int) => s"${q(k)}=$v"
      case (k, v: Long) => s"${q(k)}=$v"
      case (k, v: Short) => s"${q(k)}=$v"
      case (k, v) => s"${q(k)}=${lit(String.valueOf(v))}"
    }.mkString(", ")
    spark.sql(s"ALTER TABLE ${qualified(database, table)} " +
      s"ADD IF NOT EXISTS PARTITION ($spec)")
  }

  /** C2 — schema evolution DDL: append newly-added (nullable) columns,
    * the BACKWARD-compatible evolution the reference pushes to Hive
    * (`AvroHiveUtil.java:63-71`). */
  def addColumns(spark: SparkSession, table: String, newCols: StructType,
                 database: Option[String] = None): Unit =
    if (newCols.nonEmpty)
      spark.sql(s"ALTER TABLE ${qualified(database, table)} " +
        s"ADD COLUMNS (${newCols.toDDL})")

  /** Convenience: columns in `evolved` that `current` lacks. */
  def newColumnsOf(current: StructType, evolved: StructType): StructType =
    StructType(evolved.fields.filterNot(f => current.fieldNames.contains(f.name)))
}
