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

  private def q(ident: String): String = s"`${ident.replace("`", "``")}`"

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

  /** C1 (Avro flavor) — the DDL the reference's `AvroHiveUtil`
    * issues per Avro topic (`avro/AvroHiveUtil.java:56-97`): an
    * external partitioned table whose reader schema is pinned by an
    * explicit `avro.schema.literal` table property, so the table
    * reads with the registered schema even as newer files carry
    * evolved writer schemas (Avro schema resolution). The literal is
    * generated from the SAME StructType→Avro mapping the sink writes
    * with ([[graft.ingest.AvroSink.avroSchemaFor]]) — catalog and
    * data plane can't drift. */
  def avroTableDdl(table: String, location: String, dataSchema: StructType,
                   partitionCols: Seq[(String, String)],
                   recordName: String = "record"): String = {
    val avroJson =
      graft.ingest.AvroSink.avroSchemaFor(dataSchema, recordName).toString
    val partDdl = partitionCols.map { case (n, t) => s"${q(n)} $t" }.mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS ${q(table)} (${dataSchema.toDDL})
       |USING AVRO
       |PARTITIONED BY ($partDdl)
       |LOCATION ${lit(location)}
       |TBLPROPERTIES ('avro.schema.literal' = ${lit(avroJson)})""".stripMargin
  }

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
