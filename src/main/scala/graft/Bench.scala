package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times the headline query set at the driver's
  * SF dir and prints ONE JSON line. Each query is fully materialized
  * through the noop sink (not `count()`, which would let Catalyst prune
  * the projections being measured). Failures are recorded as negative
  * sentinels instead of being silently swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // optional arg: comma-separated query-name subset (local plan
    // triage — the driver always runs the full headline set)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    // untimed warmup: touch every input table + exercise codegen/shuffle
    // once so the first timed query doesn't absorb session start-up.
    // (A fuller warmup — running every headline query at sf0.001 first —
    // was measured WORSE: plans persist() intermediates that linger in
    // the cache and generated-code caching doesn't survive the differing
    // exprIds, so it only added memory pressure.)
    graft.tables.Tables.names.foreach { t =>
      graft.tables.Tables(spark, sfDir, t).count()
    }
    qs("route_by_partition")(spark, sfDir).write.format("noop").mode("overwrite").save()

    // min-of-2 per query: this container's run-to-run variance is ~3×
    // (it has produced phantom regressions two rounds running); the min
    // of two runs is a far lower-variance estimate of the plan's cost
    // than any single sample. Cache is cleared between runs, so run 2
    // re-executes the full plan — this measures the plan, not the cache.
    val results = SparkEntry.benchQueries
      .filter(n => only.forall(_.contains(n))).map { name =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val sec =
          try {
            qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1.0
          }
        // outside the timer: drop intermediates the query persist()ed so
        // they can't pressure later queries' memory (or run 2's timing),
        // and collect — without it, heap pressure from earlier heavy
        // queries bleeds into later timings (measured: a 2 s query
        // reading 8.6 s mid-session, back to 2 s in isolation)
        graft.queries.TrackedCache.releaseAll()
        spark.catalog.clearCache()
        System.gc()
        sec
      }
      val ok = runs.filter(_ >= 0)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.map(_._2).filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
