package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, IngestQueries, PipelineQueries, QuerySpec, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registered inventory: ingestion/commit plane (SURVEY §2.A/B),
    * relational query surface (§2.D), and the LLM-data-pipeline ops. */
  val specs: Seq[QuerySpec] = {
    val all = IngestQueries.specs ++ RelationalQueries.specs ++
      PipelineQueries.specs ++ CurationQueries.specs
    // a duplicate key would SILENTLY shadow the earlier spec in the
    // Maps below (one real query disappeared from the registry this
    // way) — refuse at construction instead
    val dup = all.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dup.isEmpty, s"duplicate query keys: ${dup.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPC-H Q1-shaped `agg_returnflag` per SURVEY §7.3. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_returnflag")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset timed by Bench each round. */
  def benchQueries: Seq[String] = specs.filter(_.bench).map(_.name)
}
