package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB regime beyond plain shuffle joins.
  *
  *  - [[saltedJoin]]: explicit skew mitigation when one key dominates —
  *    the fact side gets a random salt, the dim side is replicated
  *    across all salt values, so a hot key spreads over `saltFactor`
  *    reducers instead of one straggler task. (Spark's AQE skew-join
  *    handles sort-merge skew adaptively; salting is the explicit tool
  *    for aggregate-into-join pipelines and for engines/configs where
  *    AQE can't see the skew.)
  *  - [[writeBucketed]]: co-locate two fact tables on their join key at
  *    write time; subsequent joins read both sides pre-partitioned and
  *    skip the exchange entirely — the "pay the shuffle once" path for
  *    repeatedly-joined 100 TB tables.
  */
object ScaleJoins {

  /** Equi-join `facts ⋈ dims` on `key`, spreading each fact key over
    * `saltFactor` partitions. `dims` must be the small-ish side (it is
    * replicated `saltFactor`×). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = facts.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = dims.crossJoin(
      facts.sparkSession.range(saltFactor).select(col("id").cast("int").as("__salt")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Persist `df` bucketed+sorted by `key` into `numBuckets` buckets as
    * a managed table, enabling exchange-free sort-merge joins between
    * tables bucketed the same way. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
