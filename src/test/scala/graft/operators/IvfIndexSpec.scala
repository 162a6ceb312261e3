package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ingest.CommitLog

/** The served IVF index: train-once / probe-many through the commit
  * log, incremental append under a frozen quantizer. */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  // two well-separated clusters: A near (0,0), B near (100,100)
  private def base = Seq(
    0L -> Seq(0L, 1L), 1L -> Seq(100L, 99L),
    2L -> Seq(1L, 0L), 3L -> Seq(99L, 100L),
    4L -> Seq(2L, 2L), 5L -> Seq(101L, 101L)).toDF("id", "v")

  test("build publishes centroids+assignments; search equals assign-time ivf") {
    val idx = Files.createTempDirectory("ivf-idx").toString
    assert(IvfIndex.build(base, idx, k = 2, iters = 2) === 0L)
    // both topics live in the log at version 0
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.CentroidsTopic) === 0L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.VectorsTopic) === 0L)
    // the loaded quantizer round-trips the trained one exactly
    assert(IvfIndex.centroids(spark, idx) === KMeans.fit(base, 2, 2))
    // served search == the same construction run train-side
    val served = IvfIndex.search(spark, idx, Seq(0L, 1L), nprobe = 1, k = 2)
      .select("q_id", "neighbor_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    // nprobe=1 over clean clusters: each query's top-2 are its own
    // cluster's other members, ranked by dot product descending
    // (q0=(0,1): dot(4)=2 > dot(2)=0; q1=(100,99): dot(5)=20099 > dot(3)=19800)
    assert(served === Set((0L, 4L, 1L), (0L, 2L, 2L), (1L, 5L, 1L), (1L, 3L, 2L)))
    // rebuilding over an existing index refuses
    val e = intercept[IllegalArgumentException] {
      IvfIndex.build(base, idx, k = 2, iters = 2)
    }
    assert(e.getMessage.contains("already built"))
    // ...and so does an IVF-PQ build: it would append a second centroid
    // set with overlapping ids into the shared CentroidsTopic,
    // corrupting cell assignment for both flavors
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.buildIvfPq(base, idx, k = 2, iters = 2, m = 1, subDims = 2,
        pqK = 2, pqIters = 2)
    }
    assert(e2.getMessage.contains("centroid set"))
  }

  test("append grows the index under the FROZEN quantizer; searchers see it atomically") {
    val idx = Files.createTempDirectory("ivf-idx-grow").toString
    IvfIndex.build(base, idx, k = 2, iters = 2)
    val before = IvfIndex.centroids(spark, idx)
    // a new vector lands in cluster B without retraining
    val v1 = IvfIndex.append(Seq(6L -> Seq(98L, 98L)).toDF("id", "v"), idx)
    assert(v1 === 1L)
    // quantizer frozen: same centroids topic version, same geometry
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.CentroidsTopic) === 0L)
    assert(IvfIndex.centroids(spark, idx) === before)
    // the appended vector is probe-reachable as a neighbor...
    val ns = IvfIndex.search(spark, idx, Seq(1L), nprobe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ns === Set(3L, 5L, 6L))
    // ...and as a query (query-by-member reads the index itself)
    val back = IvfIndex.search(spark, idx, Seq(6L), nprobe = 1, k = 1)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
    assert(back.nonEmpty && back.forall(_._1 === 6L))
    // the append is an ordinary log version: incremental consumers
    // read exactly the new rows
    assert(CommitLog.readAddedSince(spark, idx, IvfIndex.VectorsTopic, 0L)
      .select("off").as[Long].collect() === Array(6L))
  }

  test("the serving plan contains no Lloyd iteration — scan+probe+heap only") {
    val idx = Files.createTempDirectory("ivf-idx-plan").toString
    IvfIndex.build(base, idx, k = 2, iters = 2)
    val plan = IvfIndex.search(spark, idx, Seq(0L), nprobe = 1, k = 2)
      .queryExecution.executedPlan.toString
    // one corpus scan (the log snapshot) + one broadcast probe join;
    // training would show as repeated scans / aggregate-collect rounds
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"serving must not rescan for training:\n$plan")
  }

  test("PQ: served ADC ranks from published codes alone; append encodes under frozen codebooks") {
    val idx = Files.createTempDirectory("pq-idx").toString
    IvfIndex.buildPq(base, idx, m = 2, subDims = 1, k = 2, iters = 1)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.PqCodebooksTopic) === 0L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.PqCodesTopic) === 0L)
    // hand-derived: first-2 init + one floor-mean update gives
    // per-subspace centroids {id0: 1, id1: 100}; codes are [0,0] for
    // cluster-A members and [1,1] for cluster-B; q0's LUT partials are
    // (m1,c0)=1, (m1,c1)=100, m0 both 0 — so B members all score 100
    val served = IvfIndex.searchPq(spark, idx, Seq(0L), subDims = 1, k = 3)
      .select("q_id", "neighbor_id", "adc", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(served === Set((0L, 1L, 100L, 1L), (0L, 3L, 100L, 2L),
      (0L, 5L, 100L, 3L)))
    // append under FROZEN codebooks: (98,98) encodes to [1,1] without
    // any retraining; the codebooks topic never advances
    assert(IvfIndex.appendPq(Seq(6L -> Seq(98L, 98L)).toDF("id", "v"), idx) === 1L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.PqCodebooksTopic) === 0L)
    val grown = IvfIndex.searchPq(spark, idx, Seq(0L), subDims = 1, k = 4)
      .select("neighbor_id", "adc").as[(Long, Long)].collect().toSet
    assert(grown === Set((1L, 100L), (3L, 100L), (5L, 100L), (6L, 100L)))
    // no Lloyd in the serving plan: scans of the two index topics only
    val plan = IvfIndex.searchPq(spark, idx, Seq(0L), subDims = 1, k = 3)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 3, s"ADC serving must not rescan for training:\n$plan")

    // streaming PQ ingest: encode-under-frozen-codebooks in the plan,
    // exactly-once append (id 6 replayed + id 7 new -> one of each)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("pq-ing-ckpt").toString
    val s = MemoryStream[(Long, Seq[Long])]
    val q = graft.streaming.IndexIngest.startPqIngest(
      s.toDF().toDF("id", "v"), idx, ckpt, flushSize = 10)
    s.addData(6L -> Seq(98L, 98L), 7L -> Seq(2L, 2L))
    q.processAllAvailable()
    q.stop()
    val codes = CommitLog.read(spark, idx, IvfIndex.PqCodesTopic)
    assert(codes.count() === 8)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.PqCodebooksTopic) === 0L)
    // (2,2) is cluster-A-coded [0,0]; searchable immediately
    val g2 = IvfIndex.searchPq(spark, idx, Seq(7L), subDims = 1, k = 2)
    assert(g2.count() === 2)
  }

  test("cell-partitioned layout: serving prunes unprobed cells' files before the scan") {
    val idx = Files.createTempDirectory("ivf-idx-prune").toString
    IvfIndex.build(base, idx, k = 2, iters = 2, flushSize = 1) // 1 file/vector
    // the commit-log partition directory IS the cell id
    val snap = CommitLog.snapshot(spark, idx, IvfIndex.VectorsTopic)
    assert(snap.size === 6)
    assert(snap.forall(r => r.startsWith("partition=0/") || r.startsWith("partition=1/")))
    // probing one cell halves the file list at the driver, pre-scan
    val (keep, total) = IvfIndex.prunedRels(spark, idx, Set(0L))
    assert(total === 6 && keep.size === 3)
    assert(keep.forall(_.startsWith("partition=0/")))
    // external query vector near cluster A: searchVectors reads only
    // cell 0's files and ranks exactly (qv=(0,1): dot(4)=2 > dot(0)=1)
    val q = Seq(100L -> Seq(0L, 1L)).toDF("id", "v")
    val res = IvfIndex.searchVectors(spark, idx, q, nprobe = 1, k = 2)
      .select("q_id", "neighbor_id", "dot", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(res === Set((100L, 4L, 2L, 1L), (100L, 0L, 1L, 2L)))
  }

  test("filtered serving composes the stats plane: refuted files skipped, semantics exact") {
    val idx = Files.createTempDirectory("ivf-idx-fstats").toString
    // two appends clustered by ingest day (the realistic skip shape):
    // day 1 = base corpus, day 2 = later vectors in the same cells
    IvfIndex.build(base, idx, k = 2, iters = 2, flushSize = 1,
      meta = Some(Seq(0L, 1L, 2L, 3L, 4L, 5L).map(_ -> 1L)
        .toDF("id", "day")),
      statsCols = Seq("day"))
    IvfIndex.append(
      Seq(6L -> Seq(3L, 1L), 7L -> Seq(98L, 97L)).toDF("id", "v"), idx,
      flushSize = 1,
      meta = Some(Seq(6L, 7L).map(_ -> 2L).toDF("id", "day")),
      statsCols = Seq("day"))
    val snap = CommitLog.snapshot(spark, idx, IvfIndex.VectorsTopic)
    assert(snap.size === 8)
    // the plane refutes day=2 for every day-1 file: a day-filtered
    // search over BOTH cells plans only the 2 day-2 files, not 8
    val kept = graft.ingest.FileStats.pruneRels(spark, idx,
      IvfIndex.VectorsTopic, col("day") === 2L, snap)
    assert(kept.size === 2, s"stats plane must skip day-1 files: $kept")
    // ...and composes UNDER cell pruning inside searchFiltered: the
    // result ranks exactly over the day-2 corpus only
    val res = IvfIndex.searchFiltered(spark, idx, Seq(0L, 1L),
        nprobe = 1, k = 2, col("day") === 2L)
      .select("q_id", "neighbor_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    // q0=(0,1) probes cell A → only day-2 member 6; q1=(100,99) →
    // only day-2 member 7
    assert(res === Set((0L, 6L, 1L), (1L, 7L, 1L)))
    // no predicate → unchanged full-corpus serving (metadata is inert)
    val full = IvfIndex.search(spark, idx, Seq(0L), nprobe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(full === Set(2L, 4L, 6L))
    // an impossible predicate prunes everything and answers empty
    assert(IvfIndex.searchFiltered(spark, idx, Seq(0L), nprobe = 1,
      k = 2, col("day") === 99L).isEmpty)
  }

  test("filtered serving composes the bloom plane: equality prunes files ranges cannot refute") {
    val idx = Files.createTempDirectory("ivf-idx-fbloom").toString
    // size rotation splits each cell at (off - first) div flushSize:
    // files are A0={0,2}, A1={4}, B0={1,3}, B1={5}. uids make A0's
    // range [10,90] STRADDLE 60 without containing it — the shape
    // where a min/max range can never refute an equality, only a
    // per-file Bloom filter can. A1/B1 are single-row files whose
    // tight ranges the stats plane refutes on its own.
    IvfIndex.build(base, idx, k = 2, iters = 2, flushSize = 3,
      meta = Some(Seq(0L -> 10L, 2L -> 90L, 4L -> 61L,
        1L -> 20L, 3L -> 60L, 5L -> 59L).toDF("id", "uid")),
      statsCols = Seq("uid"), bloomCols = Seq("uid"))
    val snap = CommitLog.snapshot(spark, idx, IvfIndex.VectorsTopic)
    assert(snap.size === 4)
    // stats plane: A0 [10,90] and B0 [20,60] both contain 60 — kept;
    // the single-row files refute
    val statsKept = graft.ingest.FileStats.pruneRels(spark, idx,
      IvfIndex.VectorsTopic, col("uid") === 60L, snap)
    assert(statsKept.size === 2,
      s"straddling ranges must defeat min/max pruning: $statsKept")
    // bloom plane: A0 has no uid=60 row — refuted; only B0 survives
    val kept = graft.ingest.FileBloom.pruneRels(spark, idx,
      IvfIndex.VectorsTopic, col("uid") === 60L, statsKept)
    assert(kept.size === 1,
      s"bloom plane must skip the straddling file not containing 60: $kept")
    // composed serving ranks exactly over the predicate-respecting
    // corpus (only vector 3 has uid=60)
    val res = IvfIndex.searchFiltered(spark, idx, Seq(0L, 1L),
        nprobe = 2, k = 3, col("uid") === 60L)
      .select("q_id", "neighbor_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(res === Set((0L, 3L, 1L), (1L, 3L, 1L)))
    // a value in NO file prunes everything and answers empty
    assert(IvfIndex.searchFiltered(spark, idx, Seq(0L), nprobe = 2,
      k = 2, col("uid") === 42L).isEmpty)
  }

  test("duplicate metadata ids refuse at build and append") {
    val idx = Files.createTempDirectory("ivf-idx-dupmeta").toString
    // a duplicate meta row would fan the LEFT join out and commit the
    // same vector twice (duplicate (part, off)) — must refuse loudly
    val e = intercept[IllegalArgumentException] {
      IvfIndex.build(base, idx, k = 2, iters = 2,
        meta = Some(Seq(0L -> 1L, 0L -> 2L, 1L -> 1L).toDF("id", "day")))
    }
    assert(e.getMessage.contains("duplicate"))
    // nothing was committed by the refused build
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.VectorsTopic) === -1L)
    val idx2 = Files.createTempDirectory("ivf-idx-dupmeta2").toString
    IvfIndex.build(base, idx2, k = 2, iters = 2)
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.append(Seq(6L -> Seq(98L, 98L)).toDF("id", "v"), idx2,
        meta = Some(Seq(6L -> 1L, 6L -> 2L).toDF("id", "day")))
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("streaming ingest grows the index exactly-once under the frozen quantizer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("ivf-idx-stream").toString
    IvfIndex.build(base, idx, k = 2, iters = 2)
    val before = IvfIndex.centroids(spark, idx)

    val ckpt = Files.createTempDirectory("ivf-ing-ckpt").toString
    val s = MemoryStream[(Long, Seq[Long])]
    val q = graft.streaming.IndexIngest.startIvfIngest(
      s.toDF().toDF("id", "v"), idx, ckpt, flushSize = 10)
    s.addData(6L -> Seq(98L, 98L), 7L -> Seq(3L, 1L))
    q.processAllAvailable()
    q.stop()
    assert(IvfIndex.vectors(spark, idx).count() === 8)

    // crash-restart with FULL replay plus one new vector: the resume
    // filter drops every committed id per cell; only id 8 lands
    val ckpt2 = Files.createTempDirectory("ivf-ing-ckpt2").toString
    val s2 = MemoryStream[(Long, Seq[Long])]
    val q2 = graft.streaming.IndexIngest.startIvfIngest(
      s2.toDF().toDF("id", "v"), idx, ckpt2, flushSize = 10)
    // a replay carries the SAME records (an at-least-once source
    // re-delivers, it does not rewrite) — ids 0-7 verbatim, 8 new
    val originals = base.select("id", "v").as[(Long, Seq[Long])]
      .collect().toSeq ++
      Seq(6L -> Seq(98L, 98L), 7L -> Seq(3L, 1L), 8L -> Seq(101L, 101L))
    s2.addData(originals: _*)
    q2.processAllAvailable()
    q2.stop()
    val all = IvfIndex.vectors(spark, idx)
    assert(all.count() === 9, "replayed ids must be skipped")
    assert(all.select(countDistinct(col("id"))).as[Long].head() === 9)
    // quantizer untouched; streamed vectors are probe-reachable
    assert(IvfIndex.centroids(spark, idx) === before)
    val ns = IvfIndex.search(spark, idx, Seq(1L), nprobe = 1, k = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ns.contains(6L), s"streamed vector must serve, got $ns")
  }

  test("generations: rebuild installs behind the serving index with one atomic flip") {
    val root = Files.createTempDirectory("ivf-gens").toString
    // no pointer yet: resolution fails loudly, never serves half-state
    val e0 = intercept[IllegalArgumentException] {
      IvfIndex.currentDir(spark, root)
    }
    assert(e0.getMessage.contains("no index generation"))
    assert(IvfIndex.rebuild(base, root, k = 2, iters = 2) === 0L)
    val dir0 = IvfIndex.currentDir(spark, root)
    assert(IvfIndex.search(spark, dir0, Seq(0L), nprobe = 1, k = 2)
      .count() === 2)
    // the corpus drifts (say emb_drift_cells fired): rebuild with the
    // grown corpus — the old generation keeps serving until the flip
    val grown = base.union(Seq(6L -> Seq(50L, 50L)).toDF("id", "v"))
    assert(IvfIndex.rebuild(grown, root, k = 2, iters = 2) === 1L)
    assert(IvfIndex.currentGeneration(spark, root) === 1L)
    val dir1 = IvfIndex.currentDir(spark, root)
    assert(dir1 !== dir0)
    assert(IvfIndex.vectors(spark, dir1).count() === 7)
    // a reader that resolved gen 0 BEFORE the flip still reads cleanly
    assert(IvfIndex.vectors(spark, dir0).count() === 6)
    // drained: drop it; the serving generation refuses
    IvfIndex.dropGeneration(spark, root, 0L)
    intercept[IllegalArgumentException] {
      IvfIndex.dropGeneration(spark, root, 1L)
    }
    assert(IvfIndex.vectors(spark, dir1).count() === 7)

    // the PQ flavor rebuilds through the same pointer protocol
    val pqRoot = Files.createTempDirectory("pq-gens").toString
    assert(IvfIndex.rebuildPq(base, pqRoot, m = 2, subDims = 1,
      k = 2, iters = 1) === 0L)
    assert(IvfIndex.searchPq(spark, IvfIndex.currentDir(spark, pqRoot),
      Seq(0L), subDims = 1, k = 3).count() === 3)
    assert(IvfIndex.rebuildPq(grown, pqRoot, m = 2, subDims = 1,
      k = 2, iters = 1) === 1L)
    assert(CommitLog.latestVersion(spark,
      IvfIndex.currentDir(spark, pqRoot), IvfIndex.PqCodesTopic) === 0L)
    assert(CommitLog.read(spark, IvfIndex.currentDir(spark, pqRoot),
      IvfIndex.PqCodesTopic).count() === 7, "gen 1 encodes the grown corpus")
  }

  test("generation GC: retired generations sweep out, in-grace and serving stay") {
    val root = Files.createTempDirectory("ivf-gen-gc").toString
    val grown = base.union(Seq(6L -> Seq(50L, 50L)).toDF("id", "v"))
    assert(IvfIndex.rebuild(base, root, k = 2, iters = 2) === 0L)
    assert(IvfIndex.rebuild(grown, root, k = 2, iters = 2) === 1L)
    // a just-flipped root under a real grace window drops NOTHING:
    // gen 0's readers may still be draining
    assert(IvfIndex.maintainGenerations(spark, root,
      graceMs = 60 * 60 * 1000L) === Seq.empty)
    assert(IvfIndex.currentGeneration(spark, root) === 1L)
    // drained (grace elapsed): exactly the one retired generation goes
    assert(IvfIndex.maintainGenerations(spark, root, graceMs = 0L) === Seq(0L))
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/gen=0")))
    // serving uninterrupted through the sweep
    assert(IvfIndex.vectors(spark, IvfIndex.currentDir(spark, root))
      .count() === 7)
    // idempotent: nothing left to drop
    assert(IvfIndex.maintainGenerations(spark, root, graceMs = 0L) === Seq.empty)
  }

  test("generation GC: a crashed rebuild's orphan blocks rebuilds until swept") {
    val root = Files.createTempDirectory("ivf-gen-orphan").toString
    val grown = base.union(Seq(6L -> Seq(50L, 50L)).toDF("id", "v"))
    assert(IvfIndex.rebuild(base, root, k = 2, iters = 2) === 0L)
    // simulate a rebuild that built gen 1 in full but crashed before
    // the pointer flip: the index exists, `_current` still says 0
    IvfIndex.build(grown, s"$root/gen=1", k = 2, iters = 2)
    assert(IvfIndex.currentGeneration(spark, root) === 0L)
    // the next rebuild targets gen 1 — the orphan's own slot — and the
    // fresh-dir refusal rejects it: the root cannot rebuild at all
    val e = intercept[IllegalArgumentException] {
      IvfIndex.rebuild(grown, root, k = 2, iters = 2)
    }
    assert(e.getMessage.contains("already built"))
    // an ACTIVE builder is protected: under a real grace the orphan's
    // fresh files keep it alive
    assert(IvfIndex.maintainGenerations(spark, root,
      graceMs = 60 * 60 * 1000L) === Seq.empty)
    // stale (grace elapsed): the sweep purges it and rebuilds converge
    assert(IvfIndex.maintainGenerations(spark, root, graceMs = 0L) === Seq(1L))
    assert(IvfIndex.rebuild(grown, root, k = 2, iters = 2) === 1L)
    assert(IvfIndex.vectors(spark, IvfIndex.currentDir(spark, root))
      .count() === 7)
  }

  test("maintainIndex: one call sweeps generations AND the serving log plane") {
    val root = Files.createTempDirectory("ivf-maint").toString
    val grown = base.union(Seq(6L -> Seq(50L, 50L)).toDF("id", "v"))
    IvfIndex.rebuild(base, root, k = 2, iters = 2)
    IvfIndex.rebuild(grown, root, k = 2, iters = 2)
    // grow the serving generation with per-row flushes: small files accrete
    IvfIndex.append(Seq(7L -> Seq(98L, 98L), 8L -> Seq(3L, 1L))
      .toDF("id", "v"), IvfIndex.currentDir(spark, root), flushSize = 1)
    val dir1 = IvfIndex.currentDir(spark, root)
    val filesBefore = CommitLog.snapshot(spark, dir1, IvfIndex.VectorsTopic).size
    val (dropped, logPlane) =
      IvfIndex.maintainIndex(spark, root, targetRecords = 100, graceMs = 0L)
    assert(dropped === Seq(0L))
    assert(logPlane.contains(IvfIndex.VectorsTopic))
    assert(CommitLog.snapshot(spark, dir1, IvfIndex.VectorsTopic).size
      < filesBefore)
    // the compacted index serves identically (cell pruning layout kept)
    val ns = IvfIndex.search(spark, dir1, Seq(1L), nprobe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ns === Set(3L, 5L, 7L))
  }

  test("index topics compact and vacuum like any logged topic") {
    val idx = Files.createTempDirectory("ivf-idx-compact").toString
    IvfIndex.build(base, idx, k = 2, iters = 2, flushSize = 1)
    IvfIndex.append(Seq(6L -> Seq(98L, 98L), 7L -> Seq(3L, 1L)).toDF("id", "v"),
      idx, flushSize = 1)
    val filesBefore = CommitLog.snapshot(spark, idx, IvfIndex.VectorsTopic).size
    CommitLog.compactLogged(spark, idx, IvfIndex.VectorsTopic,
      targetRecords = 100)
    CommitLog.vacuum(spark, idx, IvfIndex.VectorsTopic, graceMs = 0)
    val filesAfter = CommitLog.snapshot(spark, idx, IvfIndex.VectorsTopic).size
    assert(filesAfter < filesBefore)
    // searches are unaffected by the rewrite
    val ns = IvfIndex.search(spark, idx, Seq(1L), nprobe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ns === Set(3L, 5L, 6L))
  }

  test("IVF-PQ: cell-pruned residual-ADC serving; exact re-rank recovers the IVF ranking") {
    val idx = Files.createTempDirectory("ivfpq-idx").toString
    IvfIndex.buildIvfPq(base, idx, k = 2, iters = 2, m = 1, subDims = 2,
      pqK = 2, pqIters = 1)
    // all three artifacts live in the log
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.IvfPqCodesTopic) === 0L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.IvfPqCodebooksTopic) === 0L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.CentroidsTopic) === 0L)
    // nprobe=1 over clean clusters: every neighbor comes from the
    // query's own cluster (the ADC ranking inside the cell is
    // quantized; membership is the invariant)
    val served = IvfIndex.searchIvfPq(spark, idx, Seq(0L, 1L), subDims = 2,
        nprobe = 1, k = 2)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
    val clusterA = Set(0L, 2L, 4L); val clusterB = Set(1L, 3L, 5L)
    assert(served.nonEmpty)
    served.foreach { case (q, n) =>
      val own = if (clusterA(q)) clusterA else clusterB
      assert(own(n), s"neighbor $n of query $q crossed clusters")
    }
    // file pruning reaches the codes topic: one probed cell keeps
    // only that cell's files
    val cells = IvfIndex.centroids(spark, idx).map(_.id)
    val (keep, total) = IvfIndex.prunedRels(spark, idx,
      Set(cells.head), IvfIndex.IvfPqCodesTopic)
    assert(keep.nonEmpty && keep.size < total,
      s"pruning must drop the unprobed cell's files ($keep of $total)")
    // exact re-rank with a corpus-covering shortlist reproduces the
    // exact within-cell ranking (same as the plain-IVF expectation:
    // q0=(0,1): dot(4)=2 > dot(2)=0)
    val refined = IvfIndex.searchIvfPqRefined(spark, idx, Seq(0L),
        subDims = 2, nprobe = 1, shortlist = 10, k = 2)
      .select("q_id", "neighbor_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(refined === Set((0L, 4L, 1L), (0L, 2L, 2L)))
  }

  test("IVF-PQ filtered serving: stats plane skips refuted files, ADC over the filtered corpus") {
    val idx = Files.createTempDirectory("ivfpq-fstats").toString
    IvfIndex.buildIvfPq(base, idx, k = 2, iters = 2, m = 1, subDims = 2,
      pqK = 2, pqIters = 1, flushSize = 1,
      meta = Some(Seq(0L, 1L, 2L, 3L, 4L, 5L).map(_ -> 1L)
        .toDF("id", "day")),
      statsCols = Seq("day"))
    IvfIndex.appendIvfPq(
      Seq(6L -> Seq(3L, 1L), 7L -> Seq(98L, 97L)).toDF("id", "v"), idx,
      flushSize = 1)
    // cover the appended files too (append has no meta hook for
    // IVF-PQ — absent stats rows stay conservatively scanned, the
    // NULL day never satisfies the predicate)
    val snap = CommitLog.snapshot(spark, idx, IvfIndex.IvfPqCodesTopic)
    assert(snap.size === 8)
    val kept = graft.ingest.FileStats.pruneRels(spark, idx,
      IvfIndex.IvfPqCodesTopic, col("day") === 1L, snap)
    // day-1 files keep; the two appended files have NO stats row →
    // conservatively kept as well; nothing is wrongly dropped
    assert(kept.size === 8)
    // an impossible day refutes the 6 covered files, keeps only the
    // 2 uncovered appends
    assert(graft.ingest.FileStats.pruneRels(spark, idx,
      IvfIndex.IvfPqCodesTopic, col("day") === 99L, snap).size === 2)
    // filtered serving excludes the day-NULL appended vectors
    val res = IvfIndex.searchIvfPqFiltered(spark, idx, Seq(0L),
        subDims = 2, nprobe = 1, k = 4, col("day") === 1L)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res === Set(2L, 4L), s"day-1 corpus only, got $res")
    // unfiltered serving still sees everything in the probed cell
    val full = IvfIndex.searchIvfPq(spark, idx, Seq(0L), subDims = 2,
        nprobe = 1, k = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(full === Set(2L, 4L, 6L))
  }

  test("IVF-PQ lifecycle: append under BOTH frozen quantizers; streaming ingest; generation flip") {
    val idx = Files.createTempDirectory("ivfpq-grow").toString
    IvfIndex.buildIvfPq(base, idx, k = 2, iters = 2, m = 1, subDims = 2,
      pqK = 2, pqIters = 1, flushSize = 1)
    val centsBefore = IvfIndex.centroids(spark, idx)
    val (booksBefore, _) = IvfIndex.pqBooks(spark, idx,
      IvfIndex.IvfPqCodebooksTopic)

    // batch append: (98,98) lands in cluster B's CELL PARTITION with
    // neither artifact topic advancing
    assert(IvfIndex.appendIvfPq(Seq(6L -> Seq(98L, 98L)).toDF("id", "v"),
      idx, flushSize = 1) === 1L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.CentroidsTopic) === 0L)
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.IvfPqCodebooksTopic) === 0L)
    assert(IvfIndex.centroids(spark, idx) === centsBefore)
    assert(IvfIndex.pqBooks(spark, idx,
      IvfIndex.IvfPqCodebooksTopic)._1 === booksBefore)
    // the appended file joined its cell's partition directory — it
    // prunes at serving time exactly like built files
    val bCell = KMeans.assign(Seq(6L -> Seq(98L, 98L)).toDF("id", "v"),
      centsBefore).select("cell").as[Long].head()
    val (keep, _) = IvfIndex.prunedRels(spark, idx, Set(bCell),
      IvfIndex.IvfPqCodesTopic)
    assert(keep.exists(_.contains("0000000006+0000000006")),
      s"appended file must live in cell $bCell's partition: $keep")
    // ...and serves as a neighbor without any retraining
    val ns = IvfIndex.searchIvfPq(spark, idx, Seq(1L), subDims = 2,
        nprobe = 1, k = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ns.contains(6L), s"appended vector must serve, got $ns")

    // streaming ingest: replay of id 6 skipped, id 7 lands (cluster A)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ivfpq-ing-ckpt").toString
    val s = MemoryStream[(Long, Seq[Long])]
    val q = graft.streaming.IndexIngest.startIvfPqIngest(
      s.toDF().toDF("id", "v"), idx, ckpt, flushSize = 10)
    s.addData(6L -> Seq(98L, 98L), 7L -> Seq(2L, 1L))
    q.processAllAvailable()
    q.stop()
    val codes = CommitLog.read(spark, idx, IvfIndex.IvfPqCodesTopic)
    assert(codes.count() === 8, "replayed id 6 must be skipped")
    assert(CommitLog.latestVersion(spark, idx, IvfIndex.IvfPqCodebooksTopic) === 0L)
    val g2 = IvfIndex.searchIvfPq(spark, idx, Seq(7L), subDims = 2,
      nprobe = 1, k = 2)
    assert(g2.count() === 2, "streamed vector must serve as a query")

    // generations: the composed flavor rebuilds through the same
    // atomic pointer flip
    val root = Files.createTempDirectory("ivfpq-gens").toString
    assert(IvfIndex.rebuildIvfPq(base, root, k = 2, iters = 2, m = 1,
      subDims = 2, pqK = 2, pqIters = 1) === 0L)
    val grown = base.union(Seq(6L -> Seq(50L, 50L)).toDF("id", "v"))
    assert(IvfIndex.rebuildIvfPq(grown, root, k = 2, iters = 2, m = 1,
      subDims = 2, pqK = 2, pqIters = 1) === 1L)
    assert(CommitLog.read(spark, IvfIndex.currentDir(spark, root),
      IvfIndex.IvfPqCodesTopic).count() === 7,
      "gen 1 encodes the grown corpus")
  }

  test("vectors erase from the served index via deleteWhere — no rebuild, searches exclude them") {
    val idx = Files.createTempDirectory("ivf-idx-erase").toString
    IvfIndex.build(base, idx, k = 2, iters = 2, flushSize = 1)
    // a document is deleted upstream: its vector must leave the index
    // (the index topics are ordinary logged topics — the erasure
    // primitive applies; the quantizer artifact is untouched)
    val before = IvfIndex.centroids(spark, idx)
    CommitLog.deleteWhere(spark, idx, IvfIndex.VectorsTopic,
      col("off") === 3L)
    assert(IvfIndex.centroids(spark, idx) === before)
    assert(IvfIndex.vectors(spark, idx).count() === 5)
    val ns = IvfIndex.search(spark, idx, Seq(1L), nprobe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!ns.contains(3L), s"erased vector must not serve: $ns")
    assert(ns === Set(5L))
    // frozen-quantizer append still lands in the right cell afterwards
    IvfIndex.append(Seq(6L -> Seq(97L, 97L)).toDF("id", "v"), idx)
    val ns2 = IvfIndex.search(spark, idx, Seq(1L), nprobe = 1, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ns2 === Set(5L, 6L))
  }

  test("probing only empty cells returns an empty frame, not a failure") {
    val idx = Files.createTempDirectory("ivf-idx-empty").toString
    IvfIndex.build(base, idx, k = 2, iters = 2)
    // force every probe into a cell no indexed vector occupies: a
    // sparse/fresh index must serve zero neighbors, not crash
    val ghost = Seq(KMeans.Centroid(999L, Seq(500L, 500L)))
    val q = Seq(100L -> Seq(1L, 1L)).toDF("id", "v")
    val res = IvfIndex.searchVectors(spark, idx, q, nprobe = 1, k = 2,
      loadedCents = ghost)
    assert(res.columns.toSeq === Seq("q_id", "neighbor_id", "dot", "rnk"))
    assert(res.count() === 0L)
  }
}
