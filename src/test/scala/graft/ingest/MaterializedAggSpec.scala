package graft.ingest

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Materialized-view maintenance over the commit log: refreshes fold
  * in only the appended files, swaps publish atomically, compaction
  * rewrites never double-count, crashes at any point converge, and
  * the watermark rides the state file names. */
class MaterializedAggSpec extends SparkSuite {

  private def src(rows: (Long, Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("part", "off", "k", "v")
  }

  private def state(out: String) =
    MaterializedAgg.read(spark, out, "view")
      .select("k", "n", "sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("first refresh aggregates the snapshot; incremental refreshes fold only the delta") {
    val out = Files.createTempDirectory("graft-mv").toString
    CommitLog.writeLogged(src((0L, 0L, "a", 1L), (0L, 1L, "b", 10L)),
      out, "t", flushSize = 10)
    val w1 = MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(w1 === 0L)
    assert(state(out) === Set(("a", 1L, 1L), ("b", 1L, 10L)))
    // two more appends
    CommitLog.writeLogged(src((0L, 2L, "a", 2L)), out, "t", flushSize = 10)
    CommitLog.writeLogged(src((0L, 3L, "c", 100L), (0L, 4L, "a", 3L)),
      out, "t", flushSize = 10)
    val w2 = MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(w2 === 2L)
    assert(state(out) ===
      Set(("a", 3L, 6L), ("b", 1L, 10L), ("c", 1L, 100L)))
    // no new data: refresh is a watermark-preserving no-op
    assert(MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v")) === 2L)
    assert(state(out) ===
      Set(("a", 3L, 6L), ("b", 1L, 10L), ("c", 1L, 100L)))
  }

  test("source log truncation below the view watermark degrades to a snapshot rebuild") {
    val out = Files.createTempDirectory("graft-mv-trunc").toString
    CommitLog.writeLogged(src((0L, 0L, "a", 1L), (0L, 1L, "b", 10L)),
      out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    // the source moves on and its maintenance truncates the log below
    // the view's watermark (maintain knows nothing of view pins) —
    // the old changesAt walk then threw FileNotFoundException forever
    CommitLog.writeLogged(src((0L, 2L, "a", 2L)), out, "t", flushSize = 10)
    CommitLog.writeLogged(src((0L, 3L, "c", 100L)), out, "t", flushSize = 10)
    CommitLog.maintain(spark, out, "t", targetRecords = 64, graceMs = 0)
    CommitLog.maintain(spark, out, "t", targetRecords = 64, graceMs = 0)
    assert(CommitLog.versions(spark, out, "t").min > 1L,
      "precondition: the incremental window must actually be truncated")
    assert(MaintenanceMetrics.viewRebuildCount(out, "view") === 0L)
    val w = MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(MaintenanceMetrics.viewRebuildCount(out, "view") === 1L,
      "the truncation rebuild must bump the degrade counter")
    assert(w === CommitLog.latestVersion(spark, out, "t"))
    assert(state(out) ===
      Set(("a", 2L, 3L), ("b", 1L, 10L), ("c", 1L, 100L)),
      "the rebuild must converge the view to the live snapshot state")
    // and the next refresh is incremental again — counter must not move
    CommitLog.writeLogged(src((0L, 4L, "b", 5L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) ===
      Set(("a", 2L, 3L), ("b", 2L, 15L), ("c", 1L, 100L)))
    assert(MaintenanceMetrics.viewRebuildCount(out, "view") === 1L,
      "a replayable window must take the incremental path again")
  }

  test("reset(outDir) drops that dir's counters and nothing else") {
    // the counter map is process-global: a long-lived driver rotating
    // output dirs must be able to release retired dirs, and tests
    // must be able to isolate without minting unique temp dirs. (The
    // empty-snapshot early return in refresh() precedes the counter
    // bump, so a rebuild that never scans is never counted — that
    // state isn't constructible through the public API because
    // eraseSwap always retains a coverage keeper, hence no
    // integration pin for it.)
    val out = Files.createTempDirectory("graft-mv-reset").toString
    val out2 = Files.createTempDirectory("graft-mv-reset2").toString
    for (o <- Seq(out, out2)) {
      CommitLog.writeLogged(src((0L, 0L, "a", 1L)), o, "t", flushSize = 10)
      MaterializedAgg.refresh(spark, o, "t", "view",
        keys = Seq("k"), sums = Seq("v"))
      CommitLog.writeLogged(src((0L, 1L, "b", 2L)), o, "t", flushSize = 10)
      CommitLog.writeLogged(src((0L, 2L, "c", 3L)), o, "t", flushSize = 10)
      CommitLog.maintain(spark, o, "t", targetRecords = 64, graceMs = 0)
      CommitLog.maintain(spark, o, "t", targetRecords = 64, graceMs = 0)
      MaterializedAgg.refresh(spark, o, "t", "view",
        keys = Seq("k"), sums = Seq("v"))
    }
    assert(MaintenanceMetrics.viewRebuildCount(out, "view") === 1L)
    assert(MaintenanceMetrics.viewRebuildCount(out2, "view") === 1L)
    MaintenanceMetrics.reset(out)
    assert(MaintenanceMetrics.viewRebuildCount(out, "view") === 0L,
      "reset(outDir) must drop the dir's counters for long-lived drivers")
    assert(MaintenanceMetrics.viewRebuildCount(out2, "view") === 1L,
      "reset(outDir) must not touch other dirs")
  }

  test("normal-retention refresh cadence never takes the rebuild path (pin)") {
    // retention misconfiguration is the ONLY road to the expensive
    // full-state rebuild: N append+refresh cycles on a source whose
    // history is intact must keep the degrade counter at zero
    val out = Files.createTempDirectory("graft-mv-nodegrade").toString
    for (i <- 0L until 6L) {
      CommitLog.writeLogged(src((0L, i, if (i % 2 == 0) "a" else "b", i)),
        out, "t", flushSize = 10)
      MaterializedAgg.refresh(spark, out, "t", "view",
        keys = Seq("k"), sums = Seq("v"))
    }
    assert(state(out) === Set(("a", 3L, 6L), ("b", 3L, 9L)))
    assert(MaintenanceMetrics.viewRebuildCount(out, "view") === 0L,
      "an intact source history must never trigger the snapshot rebuild")
  }

  test("row-level DML on the source needs rebuild: stale until, exact after, incremental again") {
    val out = Files.createTempDirectory("graft-mv-dml").toString
    CommitLog.writeLogged(src((0L, 0L, "a", 1L), (0L, 1L, "a", 2L),
      (0L, 2L, "b", 10L), (0L, 3L, "b", 20L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) === Set(("a", 2L, 3L), ("b", 2L, 30L)))
    // erase one of a's rows: the incremental view is DOCUMENTED stale
    // (the swap version is invisible to the append-only delta feed)
    CommitLog.deleteWhere(spark, out, "t", col("off") === 1L)
    assert(MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v")) >= 0)
    assert(state(out) === Set(("a", 2L, 3L), ("b", 2L, 30L)),
      "pre-rebuild state still aggregates the erased row")
    // the post-DML correction: one live-snapshot recompute
    MaterializedAgg.rebuild(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) === Set(("a", 1L, 1L), ("b", 2L, 30L)))
    // subsequent appends fold incrementally on top of the rebuilt state
    CommitLog.writeLogged(src((0L, 4L, "a", 100L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) === Set(("a", 2L, 101L), ("b", 2L, 30L)))
    // rebuild at an UNCHANGED watermark must not overwrite live state
    // files in place (pinned readers) — names advance instead
    val before = CommitLog.snapshot(spark, out, "view")
    MaterializedAgg.rebuild(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) === Set(("a", 2L, 101L), ("b", 2L, 30L)))
    assert(CommitLog.snapshot(spark, out, "view").toSet
      .intersect(before.toSet).isEmpty,
      "a same-watermark rebuild must publish fresh file names")
  }

  test("a source compaction between refreshes is skipped — rewrites never double-count") {
    val out = Files.createTempDirectory("graft-mv-compact").toString
    CommitLog.writeLogged(src((0L, 0L, "a", 1L)), out, "t", flushSize = 10)
    CommitLog.writeLogged(src((0L, 1L, "a", 2L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) === Set(("a", 2L, 3L)))
    // compact the two tiny files into one (a swap version), plus one
    // genuinely new append
    CommitLog.compactLogged(spark, out, "t", targetRecords = 100)
    CommitLog.writeLogged(src((0L, 2L, "b", 10L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    // "a" counted once despite its rows now living in a rewrite file
    assert(state(out) === Set(("a", 2L, 3L), ("b", 1L, 10L)))
  }

  test("a refresh that crashed between staging and publish converges on retry") {
    val out = Files.createTempDirectory("graft-mv-crash").toString
    CommitLog.writeLogged(src((0L, 0L, "a", 1L)), out, "t", flushSize = 10)
    // forge the crash artifact: an installed-but-unpublished state
    // file under the name the next refresh will want
    val f = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(s"$out/view"))
    import spark.implicits._
    Seq(("stale", 99L, 99L)).toDF("k", "n", "sum_v")
      .coalesce(1).write.parquet(s"$out/view/.forge")
    val part = f.listStatus(new Path(s"$out/view/.forge"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    f.rename(part, new Path(s"$out/view/agg-0-0.parquet"))
    // retry: must rebuild deterministically, not adopt the orphan
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    assert(state(out) === Set(("a", 1L, 1L)))
  }

  test("swapped-out state files are reclaimed by the view vacuum, live ones kept") {
    val out = Files.createTempDirectory("graft-mv-vac").toString
    CommitLog.writeLogged(src((0L, 0L, "a", 1L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    CommitLog.writeLogged(src((0L, 1L, "b", 2L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq("v"))
    val gone = MaterializedAgg.vacuumView(spark, out, "view", graceMs = 0L)
    assert(gone === Seq("agg-0-0.parquet"))
    assert(state(out) === Set(("a", 1L, 1L), ("b", 1L, 2L)))
    assert(MaterializedAgg.vacuumView(spark, out, "view", graceMs = 0L).isEmpty)
  }

  test("streaming: views stay fresh per micro-batch, and a stale view back-fills on the next one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mv-stream").toString
    val ckpt = Files.createTempDirectory("graft-mv-sckpt").toString
    val s = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Long)]
    val q = graft.streaming.StreamIngest.startLoggedWithViews(
      s.toDF().toDF("part", "off", "k", "v"), out, "t",
      flushSize = 100, ckpt,
      views = Seq(MaterializedAgg.ViewDef("view", Seq("k"), Seq("v"))))
    s.addData((0L, 0L, "a", 1L), (0L, 1L, "b", 10L))
    q.processAllAvailable()
    assert(state(out) === Set(("a", 1L, 1L), ("b", 1L, 10L)))
    s.addData((0L, 2L, "a", 2L))
    q.processAllAvailable()
    q.stop()
    assert(state(out) === Set(("a", 2L, 3L), ("b", 1L, 10L)))
    // simulate a refresh that never ran (crash after publish): append
    // via the batch committer, then the restarted stream's next batch
    // back-fills the missed version too
    CommitLog.writeLogged(src((0L, 3L, "c", 100L)), out, "t", flushSize = 10)
    val ckpt2 = Files.createTempDirectory("graft-mv-sckpt2").toString
    val s2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Long)]
    val q2 = graft.streaming.StreamIngest.startLoggedWithViews(
      s2.toDF().toDF("part", "off", "k", "v"), out, "t",
      flushSize = 100, ckpt2,
      views = Seq(MaterializedAgg.ViewDef("view", Seq("k"), Seq("v"))))
    s2.addData((0L, 4L, "b", 20L))
    q2.processAllAvailable()
    q2.stop()
    assert(state(out) ===
      Set(("a", 2L, 3L), ("b", 2L, 30L), ("c", 1L, 100L)))
  }

  test("multi-topic demux: per-topic views stay fresh; a stale one back-fills on its topic's next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mv-multi").toString
    val ckpt = Files.createTempDirectory("graft-mv-mckpt").toString
    def viewState(viewTopic: String) =
      MaterializedAgg.read(spark, out, viewTopic)
        .select("k", "n", "sum_v").as[(String, Long, Long)].collect().toSet
    val views = Map(
      "alpha" -> Seq(MaterializedAgg.ViewDef("alpha_view", Seq("k"), Seq("v"))),
      "beta" -> Seq(MaterializedAgg.ViewDef("beta_view", Seq("k"), Seq("v"))))
    val s = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, String, Long)]
    val q = graft.streaming.StreamIngest.startLoggedMulti(
      s.toDF().toDF("topic", "part", "off", "k", "v"), out,
      flushSize = 100, checkpoint = ckpt, views = views)
    s.addData(("alpha", 0L, 0L, "a", 1L), ("alpha", 0L, 1L, "b", 10L),
      ("beta", 0L, 0L, "a", 5L))
    q.processAllAvailable()
    assert(viewState("alpha_view") === Set(("a", 1L, 1L), ("b", 1L, 10L)))
    assert(viewState("beta_view") === Set(("a", 1L, 5L)))
    // a batch touching only beta refreshes only beta's view
    s.addData(("beta", 0L, 1L, "a", 7L))
    q.processAllAvailable()
    q.stop()
    assert(viewState("alpha_view") === Set(("a", 1L, 1L), ("b", 1L, 10L)))
    assert(viewState("beta_view") === Set(("a", 2L, 12L)))
    // crash-staleness: a version published with NO refresh (batch
    // committer — the crash-after-publish window), then the restarted
    // multi stream's next alpha batch back-fills the missed version
    CommitLog.writeLogged(
      Seq((0L, 2L, "c", 100L)).toDF("part", "off", "k", "v"),
      out, "alpha", flushSize = 10)
    val ckpt2 = Files.createTempDirectory("graft-mv-mckpt2").toString
    val s2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, String, Long)]
    val q2 = graft.streaming.StreamIngest.startLoggedMulti(
      s2.toDF().toDF("topic", "part", "off", "k", "v"), out,
      flushSize = 100, checkpoint = ckpt2, views = views)
    s2.addData(("alpha", 0L, 3L, "b", 20L))
    q2.processAllAvailable()
    q2.stop()
    assert(viewState("alpha_view") ===
      Set(("a", 1L, 1L), ("b", 2L, 30L), ("c", 1L, 100L)))
    assert(viewState("beta_view") === Set(("a", 2L, 12L)))
  }

  test("derived keys: an event-time-bucketed view maintains per-day sums incrementally") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-mv-derive").toString
    def ev(rows: (Long, Long, java.sql.Timestamp, Long)*) =
      rows.toDF("part", "off", "ts", "v")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-02 09:00:00")
    CommitLog.writeLogged(ev((0L, 0L, t0, 5L), (0L, 1L, t1, 7L)),
      out, "t", flushSize = 10)
    val day = Seq("day" -> "unix_millis(ts) div 86400000")
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("day"), sums = Seq("v"), derive = day)
    CommitLog.writeLogged(ev((0L, 2L, t0, 1L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("day"), sums = Seq("v"), derive = day)
    val got = MaterializedAgg.read(spark, out, "view")
      .select("day", "n", "sum_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d0 = t0.getTime / 86400000L
    val d1 = t1.getTime / 86400000L
    assert(got === Set((d0, 2L, 6L), (d1, 1L, 7L)))
  }

  test("sketch columns: incrementally maintained distinct counts re-union, never re-scan") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-mv-hll").toString
    def rows(rs: (Long, Long, String, Long)*) =
      rs.toDF("part", "off", "k", "u")
    CommitLog.writeLogged(rows((0L, 0L, "a", 1L), (0L, 1L, "a", 2L),
      (0L, 2L, "b", 1L)), out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq.empty, distincts = Seq("u"))
    // second batch: one repeat user (must not inflate), one new
    CommitLog.writeLogged(rows((0L, 3L, "a", 2L), (0L, 4L, "a", 3L)),
      out, "t", flushSize = 10)
    MaterializedAgg.refresh(spark, out, "t", "view",
      keys = Seq("k"), sums = Seq.empty, distincts = Seq("u"))
    val got = MaterializedAgg.readEstimated(spark, out, "view", Seq("u"))
      .select("k", "n", "n_distinct_u")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // HLL is exact at these cardinalities: a has users {1,2,3}, b {1}
    assert(got === Set(("a", 4L, 3L), ("b", 1L, 1L)))
  }

  test("float sum columns are rejected up front") {
    val out = Files.createTempDirectory("graft-mv-float").toString
    import spark.implicits._
    CommitLog.writeLogged(
      Seq((0L, 0L, "a", 1.5)).toDF("part", "off", "k", "v"),
      out, "t", flushSize = 10)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, out, "t", "view",
        keys = Seq("k"), sums = Seq("v"))
    }
    assert(e.getMessage.contains("DECIMAL"))
  }

  test("float sums are rejected on the truncation-rebuild path too") {
    // a brand-new float-sum view whose FIRST refresh runs against an
    // already-truncated source takes the snapshot-rebuild branch — it
    // must refuse like the incremental path, not publish drifting
    // float state once and wedge every later refresh
    val out = Files.createTempDirectory("graft-mv-float-trunc").toString
    import spark.implicits._
    CommitLog.writeLogged(
      Seq((0L, 0L, "a", 1.5)).toDF("part", "off", "k", "v"),
      out, "t", flushSize = 10)
    CommitLog.writeLogged(
      Seq((0L, 1L, "b", 2.5)).toDF("part", "off", "k", "v"),
      out, "t", flushSize = 10)
    CommitLog.maintain(spark, out, "t", targetRecords = 64, graceMs = 0)
    CommitLog.maintain(spark, out, "t", targetRecords = 64, graceMs = 0)
    assert(CommitLog.versions(spark, out, "t").min > 0L,
      "precondition: the version-0 prefix must actually be truncated")
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, out, "t", "view",
        keys = Seq("k"), sums = Seq("v"))
    }
    assert(e.getMessage.contains("DECIMAL"))
  }
}
