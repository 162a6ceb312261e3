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

  /** Quote a possibly-qualified identifier part-wise, so callers can
    * target a database the way the reference's `hive.database` key
    * does — pass `"analytics.events"` anywhere a table name is taken
    * (each dot-separated part is quoted on its own; see
    * [[createDatabase]] for the db itself). */
  private def q(ident: String): String =
    ident.split('.').map(p => s"`${p.replace("`", "``")}`").mkString(".")

  /** The `hive.database` analog: create the namespace tables target
    * via qualified names (`CREATE DATABASE IF NOT EXISTS`). */
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
                          dataSchema: StructType, partitionCols: Seq[(String, String)]): Unit = {
    val dataDdl = dataSchema.toDDL
    val partDdl = partitionCols.map { case (n, t) => s"${q(n)} $t" }.mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${q(table)} ($dataDdl)
         |USING PARQUET
         |PARTITIONED BY ($partDdl)
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
                   recordName: String = "record"): String = {
    val avroJson =
      graft.ingest.AvroSink.avroSchemaFor(dataSchema, recordName).toString
    val partDdl = partitionCols.map { case (n, t) => s"${q(n)} $t" }.mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS ${q(table)} (${dataSchema.toDDL})
       |USING AVRO
       |OPTIONS ('avroSchema' = ${lit(avroJson)})
       |PARTITIONED BY ($partDdl)
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
                         recordName: String = "record"): Seq[String] = {
    val avroJson =
      graft.ingest.AvroSink.avroSchemaFor(evolved, recordName).toString
    val added = newColumnsOf(current, evolved)
    val addDdl =
      if (added.isEmpty) Seq.empty
      else Seq(s"ALTER TABLE ${q(table)} ADD COLUMNS (${added.toDDL})")
    addDdl ++ Seq(
      s"ALTER TABLE ${q(table)} SET SERDEPROPERTIES " +
        s"('avroSchema' = ${lit(avroJson)})",
      s"ALTER TABLE ${q(table)} SET TBLPROPERTIES " +
        s"('avro.schema.literal' = ${lit(avroJson)})")
  }

  /** Execute [[alterAvroSchemaDdl]] against the session catalog. */
  def alterAvroSchema(spark: SparkSession, table: String,
                      current: StructType, evolved: StructType,
                      recordName: String = "record"): Unit =
    alterAvroSchemaDdl(table, current, evolved, recordName)
      .foreach(spark.sql(_))

  /** Execute [[avroTableDdl]]. Needs the spark-avro module on the
    * cluster classpath at scan time (the DDL itself is plain Spark
    * SQL). */
  def createAvroExternalTable(spark: SparkSession, table: String, location: String,
                              dataSchema: StructType,
                              partitionCols: Seq[(String, String)],
                              recordName: String = "record"): Unit = {
    spark.sql(avroTableDdl(table, location, dataSchema, partitionCols, recordName))
    ()
  }

  /** C4 — bootstrap sync: discover on-disk partitions into the
    * metastore (the reference's leaf-dir diff, `DataWriter.java:400-414`;
    * Hive's MSCK REPAIR). */
  def syncPartitions(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE ${q(table)}")

  /** C3 — register one encoded partition explicitly (the first-write
    * hook, `TopicPartitionWriter.java:787-800`). */
  def addPartition(spark: SparkSession, table: String,
                   partitionSpec: Map[String, Any]): Unit = {
    val spec = partitionSpec.map {
      case (k, v: String) => s"${q(k)}=${lit(v)}"
      case (k, v) => s"${q(k)}=$v"
    }.mkString(", ")
    spark.sql(s"ALTER TABLE ${q(table)} ADD IF NOT EXISTS PARTITION ($spec)")
  }

  /** C2 — schema evolution DDL: append newly-added (nullable) columns,
    * the BACKWARD-compatible evolution the reference pushes to Hive
    * (`AvroHiveUtil.java:63-71`). */
  def addColumns(spark: SparkSession, table: String, newCols: StructType): Unit =
    if (newCols.nonEmpty)
      spark.sql(s"ALTER TABLE ${q(table)} ADD COLUMNS (${newCols.toDDL})")

  /** Convenience: columns in `evolved` that `current` lacks. */
  def newColumnsOf(current: StructType, evolved: StructType): StructType =
    StructType(evolved.fields.filterNot(f => current.fieldNames.contains(f.name)))
}
