package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * queries to files, so plan claims (Exchange counts, join strategies,
  * PushedFilters/ReadSchema) are checkable without running Spark.
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> [name1,name2|all] [suffix]"
  *
  * Writes `<outDir>/<name>_<suffix>.txt` (suffix defaults to
  * "before"). Queries whose lambda executes eager side-effecting work
  * (the ingest-throughput rows stage real files when the lambda is
  * invoked) still produce their FINAL frame's plan; for those the
  * interesting plans live inside the writer and are dumped by the
  * writer-specific notes in OPTIMIZATION_r17.md instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names: Seq[String] =
      if (args.length < 3 || args(2) == "all") SparkEntry.benchQueries
      else args(2).split(",").toSeq
    val suffix = if (args.length >= 4) args(3) else "before"
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.partitionPruning", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $name ($suffix)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
      graft.queries.TrackedCache.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
