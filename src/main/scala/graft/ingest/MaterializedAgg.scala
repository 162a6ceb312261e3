package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained keyed aggregates over a logged topic — the
  * materialized-view side of the transactional commit plane. A view is
  * `SELECT keys, count(*) AS n, sum(c) AS sum_c... GROUP BY keys` over
  * everything the source topic has ever committed, kept current by
  * folding in ONLY the files appended since the last refresh (the
  * change feed `readAddedSince` exposes), never by re-aggregating the
  * corpus.
  *
  * Consistency rests on two existing protocol facts and one naming
  * rule:
  *
  *   1. **Append/swap commit-kind invariant** — a source version with
  *      removes is a compaction rewrite of already-live offsets, never
  *      new data, so the delta scan (`removes.isEmpty` appends in
  *      `(W, S]`) can neither miss rows nor double-count them.
  *   2. **Atomic swap publish** — each refresh publishes the new state
  *      files and retracts the old ones in ONE log version
  *      (rename-CAS), so readers see exactly one complete state.
  *   3. **Watermark in the file name** (the engine's
  *      filename-as-metadata contract, as offsets are for data files):
  *      state files are `agg-<S>-<i>.parquet` where S is the source
  *      version the state covers. State and watermark are therefore
  *      one atomic unit — there is no sidecar to crash between. A
  *      refresh that dies before its publish leaves only unreferenced
  *      staging (rebuilt deterministically and adopted on retry); one
  *      that dies after is simply complete.
  *
  * Scale shape: the per-refresh cost is (new files' rows → keyed
  * aggregate) + (view rows → keyed merge) — the corpus is never
  * rescanned, and the merge is a union of two partial-aggregate
  * tables, map-side combined. Aggregates must be associative and
  * order-independent: counts and sums of integral/decimal columns
  * qualify; float sums would drift per merge order (cast to DECIMAL
  * first, the relational queries' discipline).
  *
  * Retention caveat (shared with the change feed): refresh within the
  * vacuum grace window of any source compaction overlapping the
  * backlog, or the original append files may be gone.
  */
object MaterializedAgg {

  private val ViewFile = "agg-(\\d+)-(\\d+)\\.parquet".r

  /** Highest source version folded into the live view state, −1 when
    * the view has never been refreshed. Derived from the live file
    * names alone — the log snapshot IS the watermark store. */
  def watermark(spark: SparkSession, outDir: String, viewTopic: String): Long =
    CommitLog.snapshot(spark, outDir, viewTopic).flatMap {
      case ViewFile(s, _) => Some(s.toLong)
      case _ => None
    }.maxOption.getOrElse(-1L)

  /** The current view state (keys + `n` + `sum_<c>` columns). */
  def read(spark: SparkSession, outDir: String, viewTopic: String): DataFrame = {
    val rels = CommitLog.snapshot(spark, outDir, viewTopic)
    require(rels.nonEmpty, s"view $viewTopic has never been refreshed")
    spark.read.parquet(rels.map(r => s"$outDir/$viewTopic/$r"): _*)
  }

  /** Fold source appends in `(watermark, latest]` into the view and
    * publish the refreshed state as one atomic swap. Returns the new
    * watermark (the current one when there is nothing to apply).
    * Re-running after a crash at any point converges — see the
    * object doc. */
  def refresh(spark: SparkSession, outDir: String, sourceTopic: String,
              viewTopic: String, keys: Seq[String], sums: Seq[String],
              format: String = "parquet", numFiles: Int = 1,
              derive: Seq[(String, String)] = Seq.empty,
              distincts: Seq[String] = Seq.empty): Long = {
    require(keys.nonEmpty, "at least one grouping key")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // the state schema owns "n", "sum_<c>", "hll_<c>", and
    // readEstimated's derived "n_distinct_<c>"; a key with those names
    // would silently collide with (or be overwritten by) those columns
    (keys ++ derive.map(_._1)).foreach(k => require(
      k != "n" && !k.startsWith("sum_") && !k.startsWith("hll_") &&
        !k.startsWith("n_distinct_"),
      s"key '$k' collides with the view's reserved aggregate columns"))
    val s1 = CommitLog.latestVersion(spark, outDir, sourceTopic)
    val w = watermark(spark, outDir, viewTopic)
    if (s1 <= w) return w
    // the incremental window needs every version file in (w, s1] —
    // truncateLog (run by the source's maintain(), which knows
    // nothing of view watermarks) may have deleted the prefix, and a
    // raw changesAt walk would then throw FileNotFoundException on
    // EVERY future refresh. Rebuild the exact state from the live
    // snapshot instead — expensive, converging, and also the path a
    // brand-new view on a truncated topic takes to catch up.
    val availVers =
      CommitLog.versions(spark, outDir, sourceTopic).toSet
    if (!((w + 1) to s1).forall(availVers.contains)) {
      val snap = CommitLog.snapshot(spark, outDir, sourceTopic)
      if (snap.isEmpty) return w // nothing live to rebuild from
      // count the degrade only once a rebuild actually runs — a
      // truncated-but-empty source above returns without scanning
      MaintenanceMetrics.viewRebuild(outDir, viewTopic)
      val raw = derive.foldLeft(
        CommitLog.readFiles(spark, outDir, sourceTopic, snap, format)) {
        case (df, (name, sqlExpr)) => df.withColumn(name, expr(sqlExpr))
      }
      val full = aggregate(raw, keys, sums, distincts)
      // same float-sum refusal as the incremental path and rebuild():
      // without it, a brand-new float-sum view whose FIRST refresh
      // runs against an already-truncated source would publish once
      // and then wedge on every later incremental refresh
      requireNoFloatSums(full, sums)
      publishState(spark, outDir, viewTopic, full, s1, startIdx = 0,
        numFiles, CommitLog.snapshot(spark, outDir, viewTopic))
      return s1
    }
    // appends only, pinned to (w, s1] — a publish racing this refresh
    // lands above s1 and is the NEXT refresh's delta
    val freshRels =
      CommitLog.addedRelsBetween(spark, outDir, sourceTopic, w, s1)
    if (freshRels.isEmpty) return w // only swaps in the window
    // derived keys (event-time buckets and the like) project onto the
    // delta BEFORE aggregation; they must be deterministic row-local
    // expressions, or replayed catch-ups would bucket differently
    val raw = derive.foldLeft(
      CommitLog.readFiles(spark, outDir, sourceTopic, freshRels, format)) {
      case (df, (name, sqlExpr)) => df.withColumn(name, expr(sqlExpr))
    }
    val delta = aggregate(raw, keys, sums, distincts)
    // float sums would make the merged state depend on refresh
    // cadence — reject at the source, not in the drifted numbers
    requireNoFloatSums(delta, sums)
    val prior = CommitLog.snapshot(spark, outDir, viewTopic)
    val merged =
      if (prior.isEmpty) delta
      else merge(read(spark, outDir, viewTopic).unionByName(delta),
        keys, sums, distincts)

    publishState(spark, outDir, viewTopic, merged, s1, startIdx = 0,
      numFiles, prior)
    s1
  }

  /** Stage the new state under a hidden dir, adopt the parts under
    * their watermark names (`agg-<s1>-<startIdx + i>.parquet`), and
    * swap them for `prior` in one atomic publish. A crashed
    * predecessor's identically-named orphans are deterministic
    * rebuilds of the same state — replaced, not trusted. */
  private def publishState(spark: SparkSession, outDir: String,
                           viewTopic: String, merged: DataFrame, s1: Long,
                           startIdx: Int, numFiles: Int,
                           prior: Seq[String]): Unit = {
    val f = CommitLog.fs(spark, outDir)
    val root = new Path(s"$outDir/$viewTopic")
    val tmp = new Path(root, s".tmp-refresh-$s1")
    merged.coalesce(numFiles).write.mode("overwrite").parquet(tmp.toString)
    val parts = f.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val adds = parts.zipWithIndex.map { case (p, i) =>
      val name = s"agg-$s1-${startIdx + i}.parquet"
      val dest = new Path(root, name)
      if (f.exists(dest)) f.delete(dest, false)
      if (!f.rename(p, dest))
        throw new java.io.IOException(s"rename failed installing $name")
      name
    }.toSeq
    CommitLog.publish(spark, outDir, viewTopic, adds, removes = prior)
    f.delete(tmp, true)
    ()
  }

  /** Full recompute of the view from the source's LIVE snapshot — the
    * post-DML correction. The incremental [[refresh]] reads the
    * commit-kind invariant as "a version with removes rewrites
    * already-live offsets, never data" — which the row-level DML
    * operations (`CommitLog.deleteWhere` / `updateWhere` /
    * `compactByKey`) deliberately break: after an erasure the view
    * still aggregates the erased rows, and no later append can correct
    * it (counts could be subtracted, HLL sketches cannot). `rebuild`
    * is the correction a caller runs after DML on the source: ONE
    * aggregate over the live snapshot, published through the same
    * atomic swap at watermark = the current source version, so
    * subsequent incremental refreshes continue exactly. Output names
    * skip past any live same-version state files (a rebuild at an
    * unchanged watermark must not overwrite files a pinned reader may
    * hold). */
  def rebuild(spark: SparkSession, outDir: String, sourceTopic: String,
              viewTopic: String, keys: Seq[String], sums: Seq[String],
              format: String = "parquet", numFiles: Int = 1,
              derive: Seq[(String, String)] = Seq.empty,
              distincts: Seq[String] = Seq.empty): Long = {
    require(keys.nonEmpty, "at least one grouping key")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    (keys ++ derive.map(_._1)).foreach(k => require(
      k != "n" && !k.startsWith("sum_") && !k.startsWith("hll_") &&
        !k.startsWith("n_distinct_"),
      s"key '$k' collides with the view's reserved aggregate columns"))
    val s1 = CommitLog.latestVersion(spark, outDir, sourceTopic)
    require(s1 >= 0, s"source topic $sourceTopic has no commit log")
    val raw = derive.foldLeft(
      CommitLog.read(spark, outDir, sourceTopic, format)) {
      case (df, (name, sqlExpr)) => df.withColumn(name, expr(sqlExpr))
    }
    val state = aggregate(raw, keys, sums, distincts)
    requireNoFloatSums(state, sums)
    val prior = CommitLog.snapshot(spark, outDir, viewTopic)
    val SameVer = s"agg-$s1-(\\d+)\\.parquet".r
    val startIdx = prior.flatMap {
      case SameVer(i) => Some(i.toInt + 1)
      case _ => None
    }.maxOption.getOrElse(0)
    publishState(spark, outDir, viewTopic, state, s1, startIdx, numFiles,
      prior)
    s1
  }

  /** One registered view's definition, for the streaming composition.
    * `derive` adds row-local derived key columns (name → SQL
    * expression, e.g. `"day" → "unix_millis(ts) div 86400000"`) so
    * event-time-bucketed views need no physical bucket column. */
  final case class ViewDef(viewTopic: String, keys: Seq[String],
                           sums: Seq[String], numFiles: Int = 1,
                           derive: Seq[(String, String)] = Seq.empty,
                           distincts: Seq[String] = Seq.empty)

  /** Refresh every registered view against the source topic — the
    * per-micro-batch hook the streaming committer calls after its
    * publish. Each view advances independently off the log, so a view
    * added later simply catches up on its first refresh, and a crash
    * between the data publish and any refresh just leaves that view
    * one version behind until the next batch (or a manual refresh)
    * folds it forward — the watermark protocol makes the catch-up
    * exact, never double-counted. */
  def refreshAll(spark: SparkSession, outDir: String, sourceTopic: String,
                 views: Seq[ViewDef], format: String = "parquet"): Unit =
    views.foreach(v => refresh(spark, outDir, sourceTopic, v.viewTopic,
      v.keys, v.sums, format, v.numFiles, v.derive, v.distincts))

  /** Physically delete view-state files a past swap retracted (the
    * data-plane vacuum skips them — they are not offset-named). Same
    * grace contract: retain what pinned readers still need. */
  def vacuumView(spark: SparkSession, outDir: String, viewTopic: String,
                 graceMs: Long = 15 * 60 * 1000L): Seq[String] = {
    val f = CommitLog.fs(spark, outDir)
    val root = new Path(s"$outDir/$viewTopic")
    if (!f.exists(root)) return Seq.empty
    val live = CommitLog.snapshot(spark, outDir, viewTopic).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    // filter on the statuses listStatus already returned — a
    // per-file getFileStatus would re-fetch the modtime with one
    // extra namenode round trip each
    val doomed = f.listStatus(root).toSeq
      .filter(st => ViewFile.pattern.matcher(st.getPath.getName).matches())
      .filter(st => !live.contains(st.getPath.getName))
      .filter(st => st.getModificationTime <= cutoff)
      .map(_.getPath)
    doomed.foreach(p => f.delete(p, false))
    doomed.map(_.getName)
  }

  /** Base aggregate: count + per-column sums + per-column HLL
    * sketches. Distinct counts ride as MERGEABLE DataSketches HLL
    * binaries (`hll_<c>`), not estimates — an estimate can't be
    * re-aggregated across refreshes, a sketch can, which is the whole
    * reason an incremental view can offer distincts at all. */
  /** Refuse float sums in any to-be-published state: merging float
    * partials makes the view depend on refresh cadence. Shared by the
    * incremental, truncation-rebuild, and full-rebuild publish paths
    * so no path can drift out of the contract. */
  private def requireNoFloatSums(state: DataFrame, sums: Seq[String]): Unit =
    state.schema.fields.filter(f => sums.contains(f.name.stripPrefix("sum_")))
      .foreach(f => require(
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.DoubleType] &&
          !f.dataType.isInstanceOf[org.apache.spark.sql.types.FloatType],
        s"sum over float column — cast to DECIMAL first (${f.name})"))

  private def aggregate(df: DataFrame, keys: Seq[String], sums: Seq[String],
                        distincts: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map(c => sum(col(c)).as(s"sum_$c")) ++
          distincts.map(c =>
            expr(s"hll_sketch_agg(`$c`)").as(s"hll_$c")): _*)

  /** Merge partial-aggregate tables: counts and sums re-sum, sketches
    * re-union. */
  private def merge(df: DataFrame, keys: Seq[String], sums: Seq[String],
                    distincts: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
          distincts.map(c =>
            expr(s"hll_union_agg(`hll_$c`)").as(s"hll_$c")): _*)

  /** [[read]] with each sketch column rendered as its estimate
    * (`n_distinct_<c>`) — the consumer-facing face of the view. */
  def readEstimated(spark: SparkSession, outDir: String, viewTopic: String,
                    distincts: Seq[String]): DataFrame =
    distincts.foldLeft(read(spark, outDir, viewTopic)) { (df, c) =>
      df.withColumn(s"n_distinct_$c",
        expr(s"hll_sketch_estimate(`hll_$c`)")).drop(s"hll_$c")
    }
}
